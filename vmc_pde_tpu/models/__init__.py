from . import coupling, flow, latent, mlp, state  # noqa: F401
