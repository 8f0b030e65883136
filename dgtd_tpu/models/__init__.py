from .cod import CODNet, baseline, cod  # noqa: F401
from .hitnet import HitNet  # noqa: F401
from .pvt import PVTv2, PVT_V2_CONFIGS  # noqa: F401
from .convnext import ConvNeXtFPNEncoder  # noqa: F401
from .diffusion import MessagePassing, PromptDecoder, PromptEncoder  # noqa: F401
from .dqnet import DQnet, DQnetNet  # noqa: F401
from .window_fusion import NewWindowFusion, WindowFusion, window_partition, window_reverse  # noqa: F401
from .mprnet import ORB, ORSNet, Decoder, DownSample, Encoder, SkipUpSample, UpSample  # noqa: F401
from .dinov2 import DINOV2_ARCHS, DinoViT  # noqa: F401
from .dpt import DinoDPTDepther, DPTHead  # noqa: F401
