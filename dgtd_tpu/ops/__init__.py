from .msda import (  # noqa: F401
    make_ms_deform_attn,
    ms_deform_attn,
    ms_deform_attn_pallas_fwd,
    ms_deform_attn_reference,
)
from .diffusion_pallas import (  # noqa: F401
    diffusion_pallas,
    diffusion_pallas_v2,
    diffusion_step_pallas,
    diffusion_step_pallas_v2,
)
