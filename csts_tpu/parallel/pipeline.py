"""GPipe-style pipeline parallelism over a uniform block stack.

The reference ships data parallelism only (SURVEY §2.2: DDP over NCCL,
``slowfast/utils/distributed.py``); pipeline parallelism is a capability beyond
it, added the TPU way: no send/recv process code, one SPMD program where stages
live on a ``pipe`` mesh axis and activations rotate between them with
``lax.ppermute`` inside a ``lax.scan`` schedule.

Scope — the same scope every production pipeline system has: the *uniform*
repeated-layer stack. For CSTS that is the stage-2 identity run (flagship
blocks 4–13: ten d384/4h blocks with identical static specs,
``custom_multimodal_builder.py:184-191`` derived geometry); patch embed,
stage-transition blocks, fusion and decoder stay outside the pipeline, exactly
as embeddings/heads stay on the first/last stage elsewhere.

Design:

* the stack's params are stacked on a leading "stage-block" axis and sharded
  over ``pipe`` — each rank holds ``L/S`` consecutive blocks;
* ``jax.shard_map`` in *partial-manual* mode (``axis_names={'pipe'}``): the
  pipeline schedule is written manually over ``pipe`` while ``data``/``seq``/
  ``model`` sharding of the activations stays under GSPMD, so dp×pp×(sp|tp)
  compose without this file knowing about the other axes;
* the batch splits into M microbatches; at schedule step t, stage s computes
  microbatch ``t-s`` (bubble steps compute on zeros, which is finite for
  LN/attention/MLP, and their results are never written back);
* stage ``S-1``'s outputs accumulate into the result buffer; a final ``psum``
  over ``pipe`` replicates them (the buffer is zero on every other stage), which
  keeps the output VMA-invariant so downstream GSPMD sharding is unaffected;
* differentiable by construction: scan + ppermute + psum all have transposes,
  so the same schedule runs the backward pipeline in reverse — no hand-written
  backward pass (the reference's analogue, DDP, has none either).

The bubble fraction is the usual (S-1)/(M+S-1); callers pick M (defaults to S).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from csts_tpu.parallel.mesh import PIPE_AXIS

# Default microbatch count per pipeline round; 0 → the pipe size S (bubble
# fraction (S-1)/(M+S-1)). Set from cfg.PARALLEL.PIPE_MICROBATCHES by
# mesh_from_cfg; an explicit ``microbatches=`` argument wins over it.
MICROBATCHES = 0


def effective_microbatches(S: int, microbatches: Optional[int] = None) -> int:
    """Resolve the microbatch count: explicit arg > module default > pipe size."""
    return microbatches or MICROBATCHES or S


def pipe_size() -> Optional[int]:
    """Size of the ambient ``pipe`` mesh axis, or None when there is no ambient
    mesh / no pipe axis (single-chip and dp/sp/tp-only programs)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or PIPE_AXIS not in mesh.axis_names:
        return None
    return int(mesh.shape[PIPE_AXIS])


def pipeline_blocks(
    stacked: object,
    x: jax.Array,
    apply_one: Callable[[object, jax.Array], jax.Array],
    *,
    microbatches: Optional[int] = None,
) -> jax.Array:
    """Run a stack of L shape-preserving blocks as an S-stage pipeline.

    ``stacked``: pytree whose every leaf has leading axis L (one slot per
    block) — typically ``{"p": stacked_params, "key": ..., "rate": ...}``.
    ``x``: (B, ...) activations; ``apply_one(slice_of_stacked, x, m) -> x``
    applies ONE block (must preserve x's shape/dtype); ``m`` is the traced
    microbatch index in [0, M) so per-microbatch RNG streams can be derived
    (``jax.random.fold_in(key, m)``) — without it every microbatch of a block
    would draw the same stochastic-depth mask. L must divide by the pipe size
    S and B by the microbatch count M.
    """
    S = pipe_size()
    assert S is not None, "pipeline_blocks requires an ambient mesh with a 'pipe' axis"
    leaves = jax.tree_util.tree_leaves(stacked)
    L = leaves[0].shape[0]
    assert L % S == 0, f"block stack of {L} does not divide over pipe={S}"
    M = effective_microbatches(S, microbatches)
    B = x.shape[0]
    assert B % M == 0, f"batch {B} does not divide into {M} microbatches"
    local_L = L // S
    P = jax.sharding.PartitionSpec

    def per_rank(stacked_local, x_full):
        stage = jax.lax.axis_index(PIPE_AXIS)
        # microbatch index goes MINOR (microbatch m = samples m, m+M, ...): the
        # batch's major subaxis (B//M) keeps the ambient ``data`` sharding, so
        # each microbatch spans all dp ranks instead of landing on one of them
        xs = jnp.moveaxis(x_full.reshape(B // M, M, *x_full.shape[1:]), 1, 0)

        def stage_fn(z, m):
            for j in range(local_L):
                z = apply_one(
                    jax.tree_util.tree_map(lambda p: p[j], stacked_local), z, m
                )
            return z

        perm = [(i, (i + 1) % S) for i in range(S)]
        # the carries become pipe-varying inside the loop; mark the (invariant
        # zero) initial values varying so scan's carry types are stable
        state = jax.lax.pcast(jnp.zeros_like(xs[0]), (PIPE_AXIS,), to="varying")
        outs = jax.lax.pcast(jnp.zeros_like(xs), (PIPE_AXIS,), to="varying")

        def step(carry, t):
            state, outs = carry
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            inp = jnp.where(stage == 0, feed, state)
            # stage s at schedule step t holds microbatch t-s (bubble steps
            # clip to a valid id; their outputs are never banked)
            out = stage_fn(inp, jnp.clip(t - stage, 0, M - 1))
            # stage S-1 banks microbatch t-(S-1); other stages re-write an
            # existing slot with its own value (a no-op)
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, widx, 0, keepdims=False)
            banked = jnp.where((stage == S - 1) & (t >= S - 1), out, prev)
            outs = jax.lax.dynamic_update_index_in_dim(outs, banked, widx, 0)
            state = jax.lax.ppermute(out, PIPE_AXIS, perm)
            return (state, outs), None

        (_, outs), _ = jax.lax.scan(
            step, (state, outs), jnp.arange(M + S - 1)
        )
        # only the last stage holds real outputs; replicate them across pipe
        outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, PIPE_AXIS)
        return jnp.moveaxis(outs, 0, 1).reshape(x_full.shape)

    return jax.shard_map(
        per_rank,
        in_specs=(P(PIPE_AXIS), P()),
        out_specs=P(),
        axis_names={PIPE_AXIS},
    )(stacked, x)
