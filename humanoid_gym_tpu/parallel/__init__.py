"""Device-mesh construction and sharding rules.

The scaling design (SURVEY.md §2.3): environments are embarrassingly parallel
— the env axis is sharded over every available chip (ICI within a slice, DCN
across hosts), parameters are replicated, and the only cross-shard couplings
of training (advantage normalization, adaptive-LR KL mean, gradient
reduction) are jnp-level global reductions that XLA lowers to psums over the
mesh. No hand-written communication backend (the reference's analog was a
dead --horovod flag, helpers.py:208-212).
"""

from .mesh import make_env_mesh, shard_env_axis, replicate

__all__ = ["make_env_mesh", "shard_env_axis", "replicate"]
