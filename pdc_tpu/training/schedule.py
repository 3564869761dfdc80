"""Learning-rate schedule.

The reference multiplies the LR by ``learning_rate_decay`` (0.9) every
``steps_between_learning_rate_decay`` (250) iterations
(``training.py:544-558``) — a staircase exponential decay.
"""

import optax


def host_lr(training_config: dict, iteration: int) -> float:
    """The staircase LR computed in pure Python — the optax schedule is a
    device computation, and fetching it per step costs a device round trip
    (expensive through the TPU tunnel)."""
    t = training_config["training"]
    return float(t["learning_rate"]) * float(t["learning_rate_decay"]) ** (
        iteration // int(t["steps_between_learning_rate_decay"])
    )


def make_lr_schedule(training_config: dict):
    t = training_config["training"]
    return optax.exponential_decay(
        init_value=float(t["learning_rate"]),
        transition_steps=int(t["steps_between_learning_rate_decay"]),
        decay_rate=float(t["learning_rate_decay"]),
        staircase=True,
    )
