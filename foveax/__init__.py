"""foveax — a TPU-native framework for foveated 360° video streaming.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AugmentariumLab/foveated-360-video (IEEE VR 2021 / TVCG: "A Log-Rectilinear
Transformation for Foveated 360-degree Video Streaming"):

- ``foveax.core``     pure-JAX transform math (log-rectilinear, SAT, log-polar,
                      gnomonic, SVD-SAT), shape-static and jit-able.
- ``foveax.kernels``  Pallas TPU kernels for the hot ops (blocked 2D prefix
                      scan, fused sampling).
- ``foveax.pipeline`` per-frame pipeline functions (foveate / unwarp / full),
                      multi-gaze vmap batching, host-side runners.
- ``foveax.parallel`` device-mesh sharding (client data-parallel, spatial
                      scan parallelism) via jax.sharding / shard_map.
- ``foveax.io``       video decode/encode, PNG, gaze traces, fragment mux.
- ``foveax.serve``    asyncio websocket server/client speaking the reference
                      JSON + binary-fragment protocol.
- ``foveax.cli``      command-line drivers mirroring the reference's
                      driver.x / client_driver.x / run_satlogrectilinear.x.
"""

from foveax.config import FoveaxConfig

__version__ = "0.1.0"

__all__ = ["FoveaxConfig", "__version__"]
