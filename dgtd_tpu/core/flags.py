"""Runtime feature flags (kernel selection, debug toggles).

Plain module-level switches read at trace time — flip before building/jitting
a model. The reference has no analog (its toggles were file copies); these are
the framework's sanctioned experiment knobs.
"""

#: diffusion stencil layout/kernel selection: None = auto (plane-layout
#: Pallas on TPU for grids >= models.diffusion.PALLAS_MIN_GRID, fused XLA
#: otherwise); True/False force it (tests force True with interpret mode).
diffusion_plane_layout = None

#: jnp NaN debugging (jax debug_nans passthrough — SURVEY.md §5 plan).
debug_nans: bool = False


def set_flag(name: str, value) -> None:
    if not hasattr(__import__(__name__, fromlist=["_"]), name):
        raise AttributeError(f"unknown flag {name}")
    globals()[name] = value
    if name == "debug_nans":
        import jax

        jax.config.update("jax_debug_nans", bool(value))
