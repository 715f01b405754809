"""point_cloud_donkey_tpu: a TPU-native (JAX/XLA/Pallas/pjit) re-design of the
Implicit Shape Model 3D point-cloud classification/detection framework
(capability parity target: vseib/point-cloud-donkey).

Architecture (TPU-first, not a port):
  * All geometry kernels operate on fixed-capacity padded arrays with masks so
    every pipeline stage is statically shaped and `jit`-compilable.
  * Neighborhood reductions (normals, LRFs, descriptors) are expressed as
    masked dense matmuls/segment reductions that map onto the MXU/VPU instead
    of kd-tree traversals (reference: PCL kd-trees, e.g.
    src/implicit_shape_model/features/features_short_shot.cpp:85).
  * k-NN codebook activation is an exact brute-force distance matmul
    (reference: FLANN indices, src/implicit_shape_model/utils/flann_helper.cpp:21-80).
  * Voting/mean-shift run as fixed-iteration vectorized loops under `jit`
    (reference: src/implicit_shape_model/voting/voting_mean_shift.cpp).
  * Batches of clouds shard across TPU chips via `jax.sharding.Mesh` + pjit
    (the reference is single-process OpenMP; see SURVEY.md section 2.4).
"""

__version__ = "0.1.0"
