"""Config system honoring the reference's `.ism` JSON schema.

The reference registers typed parameters with defaults via
``addParameter(ref, name, default)`` (utils/json_object.h:78-80) and builds the
component tree from ``ObjectConfig{Parameters, Children{...{Type, Parameters}}}``
(implicit_shape_model.cpp:1070-1142).  Unknown JSON keys are ignored (comment
keys are used as documentation in config/default.ism).

Here each component family declares a parameter schema (name -> default); a
``ComponentConfig`` resolves config values against the schema.  The full tree
is held by :class:`IsmConfig`, which can round-trip the reference's `.ism`
files so experiment setups port unchanged.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


class ConfigError(ValueError):
    pass


def _coerce(value: Any, default: Any) -> Any:
    """Coerce a JSON value to the type of the schema default (like the
    reference's JSONParameterTraits<T>, utils/json_parameter_traits.h)."""
    if default is None:
        return value
    if isinstance(default, bool):
        if isinstance(value, bool):
            return value
        raise ConfigError(f"expected bool, got {value!r}")
    if isinstance(default, int) and not isinstance(default, bool):
        if isinstance(value, bool):
            raise ConfigError(f"expected int, got bool {value!r}")
        return int(value)
    if isinstance(default, float):
        return float(value)
    if isinstance(default, str):
        return str(value)
    return value


@dataclass
class ComponentConfig:
    """One node of the config tree: a `Type` string plus resolved parameters.

    Mirrors one JSONObject subtree ``{"Type": ..., "Parameters": {...},
    "Children": {...}}``.
    """

    type: str = ""
    params: Dict[str, Any] = field(default_factory=dict)
    children: Dict[str, "ComponentConfig"] = field(default_factory=dict)

    @classmethod
    def from_json(cls, obj: Dict[str, Any]) -> "ComponentConfig":
        if obj is None:
            return cls()
        params = dict(obj.get("Parameters", {}) or {})
        children = {
            name: cls.from_json(child)
            for name, child in (obj.get("Children", {}) or {}).items()
        }
        return cls(type=str(obj.get("Type", "")), params=params, children=children)

    def to_json(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if self.children:
            out["Children"] = {k: v.to_json() for k, v in self.children.items()}
        if self.params:
            out["Parameters"] = dict(self.params)
        if self.type:
            out["Type"] = self.type
        return out

    def get(self, name: str, default: Any) -> Any:
        """Resolve a parameter against its default (addParameter semantics:
        missing keys fall back to the registered default; unknown keys in the
        file are ignored)."""
        if name in self.params:
            try:
                return _coerce(self.params[name], default)
            except ConfigError as e:
                raise ConfigError(f"parameter {name!r}: {e}") from e
        return default

    def resolve(self, schema: Dict[str, Any]) -> Dict[str, Any]:
        """Resolve a full schema {name: default} into concrete values."""
        return {name: self.get(name, default) for name, default in schema.items()}

    def child(self, name: str) -> "ComponentConfig":
        return self.children.get(name, ComponentConfig())


@dataclass
class IsmConfig:
    """The whole `.ism` config: root parameters + named children.

    Children mirror implicit_shape_model.cpp:1085-1142: Codebook (with nested
    ActivationStrategy), Keypoints, Features, GlobalFeatures, Clustering,
    Voting, FeatureWeighting.  A missing GlobalFeatures child becomes the Dummy
    descriptor (implicit_shape_model.cpp:1106-1114).
    """

    root: ComponentConfig = field(default_factory=ComponentConfig)

    @classmethod
    def from_json(cls, obj: Dict[str, Any]) -> "IsmConfig":
        if "ObjectConfig" not in obj:
            raise ConfigError("missing ObjectConfig root key")
        cfg = cls(root=ComponentConfig.from_json(obj["ObjectConfig"]))
        # back-compat shim: missing GlobalFeatures -> Dummy
        if "GlobalFeatures" not in cfg.root.children:
            cfg.root.children["GlobalFeatures"] = ComponentConfig(type="Dummy")
        return cfg

    @classmethod
    def load(cls, path: str) -> "IsmConfig":
        with open(path, "r") as f:
            return cls.from_json(json.load(f))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"ObjectConfig": self.root.to_json()}, f, indent=3, sort_keys=True)

    @classmethod
    def template(cls) -> "IsmConfig":
        """Fully-populated default config (the reference emits one when an
        empty model is written, implicit_shape_model.h:78-80): every root
        parameter at its default plus a default child per component family."""
        root = ComponentConfig(params=dict(ROOT_SCHEMA))
        root.children = {
            "Codebook": ComponentConfig(params={
                "UseClassWeight": False, "UseVoteWeight": False,
                "UseMatchingWeight": False, "UseCodewordWeight": False,
                "UsePartialShot": False, "PartialShotType": "front",
            }, children={"ActivationStrategy": ComponentConfig(
                type="KNN", params={"K": 1, "UseDistanceRatio": False,
                                    "DistanceRatioThreshold": 0.8})}),
            "Keypoints": ComponentConfig(type="VoxelGrid",
                                         params={"LeafSize": 0.02}),
            "Features": ComponentConfig(type="SHOT", params={
                "Radius": 0.1, "ReferenceFrameRadius": 0.2,
                "ReferenceFrameType": "SHOT"}),
            "GlobalFeatures": ComponentConfig(type="Dummy"),
            "Clustering": ComponentConfig(type="None"),
            "Voting": ComponentConfig(type="MeanShift", params={
                "Bandwidth": 0.1, "Kernel": "Gaussian", "Threshold": 1e-3,
                "MaxIter": 1000, "MinWeight": 0.0, "MaxFilterType": "None",
                "SingleObjectMaxType": "None", "UseGlobalFeatures": False,
                "GlobalFeatureInfluenceType": 4, "MinVotesThreshold": 1}),
            "FeatureWeighting": ComponentConfig(type="Uniform", params={
                "ExtractFromList": "none", "Factor": 1.0}),
        }
        return cls(root=root)

    # convenience accessors -------------------------------------------------
    @property
    def params(self) -> ComponentConfig:
        return self.root

    def child(self, name: str) -> ComponentConfig:
        return self.root.child(name)


# Root parameter schema of the orchestrator
# (reference: implicit_shape_model.cpp:92-126).
ROOT_SCHEMA: Dict[str, Any] = {
    # preprocessing
    "UseSmoothing": False,
    "SmoothingPolynomialOrder": 1,
    "SmoothingRadius": 0.01,
    "UseStatisticalOutlierRemoval": False,
    "OutlierRemovalMeanK": 20,
    "OutlierRemovalStddevMul": 2.0,
    "UseRadiusOutlierRemoval": False,
    "OutlierRemovalMinNeighbors": 10,
    "OutlierRemovalRadius": 0.005,
    "UseVoxelFiltering": False,
    "VoxelLeafSize": 0.0015,
    "CutoffDistanceZAxis": 0.0,
    # detection eval thresholds
    "DistanceThresholdDetection": 0.05,
    "DistanceThresholdType": "Fixed",
    # core
    "DistanceType": "Euclidean",
    "NormalRadius": 0.05,
    "ConsistentNormalsK": 10,
    "ConsistentNormalsMethod": 2,
    "NumThreads": 0,
    "BoundingBoxType": "MVBB",
    "EnableVotingAnalysis": False,
    "VotingAnalysisOutputPath": "",
    "UseSvmTraining": False,
    "SvmAutoTrain": False,
    "SvmOneVsAllTraining": False,
    "SvmParamC": 7.41,
    "SvmParamGamma": 2.96,
    "SvmParamKfold": 10,
    "SingleObjectMode": False,
    "FLANNNumKDTrees": 4,
    "FLANNExactMatch": False,
    "InstanceLabelsPrimary": True,
}
