"""dgtd_tpu — TPU-native depth-guided texture diffusion segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``CVPR23/Depth-guided-Texture-Diffusion-for-Image-Semantic-Segmentation``
(the ``twig/`` NEST+MMEngine plugin package): RGB-D camouflaged/salient
object segmentation with a PVTv2 pyramid backbone, a depth-guided texture
diffusion prompt module, a HitNet iterative refinement decoder, SOD metric
suite, and YAML-recipe-driven training — all designed TPU-first (NHWC,
bf16 compute, pjit/shard_map data parallelism over a device mesh, Pallas
kernels for the stencil diffusion and multi-scale deformable attention).

Package layout:
  core/      registry + YAML config system (reference: NEST @export + MMEngine Runner cfg)
  utils/     TPU-friendly image ops (matmul bilinear resize, pooling, fft high-pass)
  models/    PVTv2, ConvNeXt, diffusion prompt modules, HitNet, cod/baseline/DQnet
  ops/       Pallas kernels + pure-jnp references (diffusion stencil, ms-deform-attn)
  data/      dataset loaders with the reference's directory conventions
  metrics/   native vectorized S/E/F/MAE/WFm/mIoU (reference: py_sod_metrics wrappers)
  train/     optax train state, lr-mult param groups, cosine schedule, orbax ckpt, loops
  parallel/  jax.sharding mesh + sharding rules (reference: 2-GPU DDP/NCCL)
  tools/     torch .pth -> jax checkpoint converter, offline depth generation
"""

__version__ = "0.1.0"

# Importing the component packages populates the registries (models, datasets,
# metrics, hooks) so YAML `type:` names resolve — the package-import analog of
# NEST loading twig/* as plugin modules.
from . import models  # noqa: E402,F401
from .data import datasets  # noqa: E402,F401
from .metrics import evaluators  # noqa: E402,F401
from .train import hooks  # noqa: E402,F401
from .train import layer_decay  # noqa: E402,F401
from .utils import visualizer  # noqa: E402,F401
