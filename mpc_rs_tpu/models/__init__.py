from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.models import costs, dynamics, noise, observation, reference

__all__ = ["CartPoleParams", "costs", "dynamics", "noise", "observation", "reference"]
