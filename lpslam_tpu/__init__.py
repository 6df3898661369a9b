"""lpslam_tpu — TPU-native visual SLAM engine.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
lp-research/lpslam (lpslam pipeline + its OpenVSLAM fork + DBoW2 + g2o):

- ``geometry``  : SO3/SE3/Sim3 Lie groups, camera models, frame conventions.
- ``kernels``   : Pallas/JAX device kernels — image pyramid, FAST, ORB
                  (orientation + rBRIEF), Hamming matching, stereo row match,
                  BoW assignment/scoring, remap-undistort.
- ``frontend``  : per-frame tracking (predict → project → match → pose LM),
                  two-view initialization, keyframe policy.
- ``mapstore``  : fixed-capacity device-resident keyframe/landmark store.
- ``backend``   : Levenberg–Marquardt bundle adjustment with Schur-complement
                  reduction; Sim3 pose-graph optimization.
- ``loop``      : bag-of-words vocabulary, loop detection, Sim3 verification.
- ``dist``      : device meshes and distributed (sharded) bundle adjustment.
- ``pipeline``  : SlamManager-style orchestration — sources, processors,
                  trackers, record/replay, config, status, callbacks.
- ``io``        : dataset readers (EuRoC / TUM RGB-D / lpslam .pb recordings),
                  synthetic sequence generation.
- ``eval``      : ATE/RPE trajectory evaluation, benchmarking helpers.
- ``interface`` : public API mirroring the reference's LpSlamManager surface.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXU defaults f32 matmuls to bf16 inputs. SLAM geometry (triangulation,
# pose optimization, Schur blocks) collapses under an 8-bit mantissa — on a
# real chip the map silently starves (~16x fewer landmarks) and tracking is
# lost within ~60 frames, while CPU runs are unaffected. Correctness first:
# force full f32 everywhere, then opt individual large, provably-exact
# matmuls (binary-descriptor Hamming popcounts, BoW assignment — small-int
# values) back into bf16/int8 MXU paths per-op via `precision=` where the
# win is measured.
_jax.config.update("jax_default_matmul_precision", "highest")
