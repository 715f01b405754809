"""Typed exceptions (reference utils/exception.{h,cpp}: RuntimeException,
JSONException, BadParamExceptionType<T>).  The CLIs catch IsmError at top
level and exit with a message, mirroring eval_classification.cpp:574-581."""

from __future__ import annotations


class IsmError(Exception):
    """Base of all framework errors (ism3d::Exception)."""


class RuntimeError_(IsmError):
    """ism3d::RuntimeException: invalid state at runtime."""


class JSONError(IsmError):
    """ism3d::JSONException: malformed config / model files."""


class BadParamError(IsmError):
    """ism3d::BadParamExceptionType<T>: a parameter value is invalid.
    Carries the parameter name and the offending value."""

    def __init__(self, param: str, value=None, message: str = ""):
        self.param = param
        self.value = value
        super().__init__(
            message or f"bad parameter {param!r}: {value!r}")
