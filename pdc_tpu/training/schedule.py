"""Learning-rate schedule.

The reference multiplies the LR by ``learning_rate_decay`` (0.9) every
``steps_between_learning_rate_decay`` (250) iterations
(``training.py:544-558``) — a staircase exponential decay.
"""

import optax


def make_lr_schedule(training_config: dict):
    t = training_config["training"]
    return optax.exponential_decay(
        init_value=float(t["learning_rate"]),
        transition_steps=int(t["steps_between_learning_rate_decay"]),
        decay_rate=float(t["learning_rate_decay"]),
        staircase=True,
    )
