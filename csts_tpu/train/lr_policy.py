"""Learning-rate schedules (reference: ``slowfast/utils/lr_policy.py:9-94``).

Pure functions of (cfg.SOLVER, fractional epoch); jit-compatible via jnp math so the
per-step LR lives inside the compiled train step instead of the reference's
host-side ``set_lr`` call each iteration (optimizer.py:111-130).
"""

from __future__ import annotations

import jax.numpy as jnp

from csts_tpu.config import SolverConfig


def lr_func_cosine(solver: SolverConfig, cur_epoch):
    offset = solver.WARMUP_EPOCHS if solver.COSINE_AFTER_WARMUP else 0.0
    assert solver.COSINE_END_LR < solver.BASE_LR
    return (
        solver.COSINE_END_LR
        + (solver.BASE_LR - solver.COSINE_END_LR)
        * (jnp.cos(jnp.pi * (cur_epoch - offset) / (solver.MAX_EPOCH - offset)) + 1.0)
        * 0.5
    )


def lr_func_steps_with_relative_lrs(solver: SolverConfig, cur_epoch):
    # Static branch selection is fine here: steps are config constants, and the
    # schedule is evaluated on traced epochs via piecewise select.
    steps = list(solver.STEPS) + [solver.MAX_EPOCH]
    lr = jnp.asarray(solver.LRS[0] * solver.BASE_LR)
    for ind in range(len(steps) - 1):
        lr = jnp.where(
            cur_epoch >= steps[ind],
            solver.LRS[min(ind, len(solver.LRS) - 1)] * solver.BASE_LR,
            lr,
        )
    return lr


_POLICIES = {
    "cosine": lr_func_cosine,
    "steps_with_relative_lrs": lr_func_steps_with_relative_lrs,
}


def get_lr_at_epoch(solver: SolverConfig, cur_epoch):
    """LR with linear warmup (lr_policy.py:9-27). ``cur_epoch`` may be traced."""
    if solver.LR_POLICY not in _POLICIES:
        raise NotImplementedError(f"Unknown LR policy: {solver.LR_POLICY}")
    policy = _POLICIES[solver.LR_POLICY]
    lr = policy(solver, cur_epoch)
    if solver.WARMUP_EPOCHS > 0:
        lr_start = solver.WARMUP_START_LR
        lr_end = policy(solver, solver.WARMUP_EPOCHS)
        alpha = (lr_end - lr_start) / solver.WARMUP_EPOCHS
        warmup_lr = cur_epoch * alpha + lr_start
        lr = jnp.where(cur_epoch < solver.WARMUP_EPOCHS, warmup_lr, lr)
    return lr
