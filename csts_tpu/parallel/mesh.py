"""Device mesh and sharding policy.

The reference's distributed runtime (``slowfast/utils/distributed.py`` +
``multiprocessing.py``: one process per GPU, NCCL process groups, DDP gradient
buckets, DistributedSampler) collapses on TPU into a single SPMD program:

* one jax process per host, all devices in a ``jax.sharding.Mesh``;
* the batch is sharded over the ``data`` axis (NamedSharding P("data")), params are
  replicated — XLA inserts the gradient psum that DDP does by hand;
* the EgoNCE similarity matrix is computed over the *global* batch simply by writing
  the matmul on sharded embeddings — XLA's collective lowering replaces the
  reference's hand-rolled differentiable all_gather (``AllGather_multi``,
  distributed.py:15-49) and fixes its rank-0 backward bug;
* multi-host (NUM_SHARDS analogue) is ``jax.distributed.initialize`` + the same
  program over a bigger mesh: ICI within a slice, DCN across slices.

A ``model`` axis is provisioned for tensor parallelism of the 768-wide stages — a
capability beyond the reference (which ships data parallelism only, SURVEY §2.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"


def make_mesh(
    num_devices: Optional[int] = None,
    model_parallel: int = 1,
    seq_parallel: int = 1,
    pipe_parallel: int = 1,
) -> Mesh:
    """1-D data mesh by default; adds a ``model`` axis (tensor parallelism) when
    ``model_parallel`` > 1, a ``seq`` axis (context/sequence parallelism over
    the token dimension — see ``seq_constraint``) when ``seq_parallel`` > 1,
    and a ``pipe`` axis (GPipe-style pipeline parallelism over the uniform
    encoder block stack — see ``parallel/pipeline.py``) when
    ``pipe_parallel`` > 1. ``pipe`` is the outermost non-data axis: pipeline
    point-to-point traffic is the cheapest collective, so it is the axis that
    tolerates the slowest links (DCN between slices) best."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    denom = model_parallel * seq_parallel * pipe_parallel
    assert n % denom == 0, (n, model_parallel, seq_parallel, pipe_parallel)
    dp = n // denom
    shape, axes = [dp], [DATA_AXIS]
    if pipe_parallel > 1:
        shape.append(pipe_parallel)
        axes.append(PIPE_AXIS)
    if seq_parallel > 1:
        shape.append(seq_parallel)
        axes.append(SEQ_AXIS)
    if model_parallel > 1:
        shape.append(model_parallel)
        axes.append(MODEL_AXIS)
    return Mesh(_device_grid(devices, shape), tuple(axes))


def _device_grid(devices, shape) -> np.ndarray:
    """Topology-aware layout of ``devices`` onto ``shape``.

    A naive ``reshape`` of ``jax.devices()`` ignores ICI topology and slice
    boundaries on real TPU pods — e.g. a ``model`` pair could straddle slices
    and ride DCN. Axis order is [data, pipe, seq, model] (major→minor), so:

    * multi-slice (devices expose distinct ``slice_index``): lay the mesh with
      ``mesh_utils.create_hybrid_device_mesh`` — slices absorb the leading
      ``data`` axis (the gradient psum is the latency-tolerant collective;
      tp/sp/pp stay inside a slice on ICI). Requires dp % num_slices == 0.
    * single slice: ``mesh_utils.create_device_mesh`` — the minor axes get the
      tightest ICI rings (model innermost, exactly the bandwidth ranking).
    * virtual/CPU platforms and partial-topology subsets (``num_devices``
      trims): plain enumeration-order reshape (on CPU ``create_device_mesh``
      degenerates to the same thing — tested equivalence keeps the virtual-mesh
      test semantics unchanged).
    """
    if len(devices) == 1:
        return np.asarray(devices).reshape(shape)
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    try:
        from jax.experimental import mesh_utils

        if len(slice_ids) > 1 and None not in slice_ids:
            num_slices = len(slice_ids)
            if shape[0] % num_slices == 0:
                dcn = [num_slices] + [1] * (len(shape) - 1)
                ici = [shape[0] // num_slices] + list(shape[1:])
                return mesh_utils.create_hybrid_device_mesh(
                    ici, dcn, devices=devices
                )
        return mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        return np.asarray(devices).reshape(shape)


def mesh_from_cfg(cfg) -> Mesh:
    """Build the run's mesh from ``cfg.NUM_DEVICES`` + ``cfg.PARALLEL`` (the
    trainer/tester entry point; library callers use :func:`make_mesh`)."""
    from csts_tpu.parallel import pipeline as pipeline_lib

    pipeline_lib.MICROBATCHES = cfg.PARALLEL.PIPE_MICROBATCHES
    return make_mesh(
        num_devices=cfg.NUM_DEVICES if cfg.NUM_DEVICES > 0 else None,
        model_parallel=cfg.PARALLEL.MODEL,
        seq_parallel=cfg.PARALLEL.SEQ,
        pipe_parallel=cfg.PARALLEL.PIPE,
    )


def seq_constraint(tokens):
    """Context-parallel annotation for (B, L, C) token activations.

    When the ambient mesh carries a ``seq`` axis, constrain the token axis to it
    and let GSPMD propagate the sharding — XLA inserts the halo exchanges for
    the pool convs and the (all-)gathers feeding the pooled-KV attention, the
    TPU-native counterpart of hand-written ring/Ulysses context parallelism.
    The reference never shards the sequence (SURVEY §2.2 — max 16 384 stem
    tokens); this is a capability beyond it, exercised by
    ``__graft_entry__.dryrun_multichip`` phase 4 and the sp-parity test.
    No-op (returns ``tokens`` unchanged) without an ambient ``seq`` axis or
    when the token count does not divide it.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or SEQ_AXIS not in mesh.axis_names:
        return tokens
    n = mesh.shape[SEQ_AXIS]
    if tokens.ndim != 3 or tokens.shape[1] % n:
        return tokens
    return jax.lax.with_sharding_constraint(
        tokens, P(DATA_AXIS if DATA_AXIS in mesh.axis_names else None, SEQ_AXIS)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded along axis 0.

    Multi-process: each process holds only ITS stripe of the global batch
    (loader.py per-host striping), so a plain device_put with the global
    sharding would mis-read the local value as the global array —
    ``jax.make_array_from_process_local_data`` assembles the global batch
    from the per-process stripes instead."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def shard_batch_padded(mesh: Mesh, batch):
    """Like :func:`shard_batch`, but pads the batch (repeating the last sample)
    up to a data-axis multiple first. Returns ``(device_batch, true_n)`` — the
    caller slices device outputs back to ``true_n`` before metrics. Eval-only:
    the short FINAL batch of a test set rarely divides the chip count (the
    reference sidesteps this with a dataset-divisibility assert,
    test_avgaze_net.py:126; training keeps the hard divisibility contract)."""
    import numpy as _np

    dp = mesh.shape[DATA_AXIS]
    # each process feeds its share of the data axis; pad the LOCAL stripe to a
    # multiple of that share (single-process: share == dp)
    share = max(dp // jax.process_count(), 1)
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % share
    if pad:
        batch = {
            k: _np.concatenate([v, _np.repeat(v[-1:], pad, axis=0)])
            for k, v in batch.items()
        }
    return shard_batch(mesh, batch), n


def host_local_batch(mesh: Mesh, tree):
    """Data-sharded global arrays → this process's local numpy stripe.

    Single-process this is a plain np.asarray (fully addressable). Multi-process
    the tester/trainer must NOT np.asarray a global array (non-addressable
    shards); this returns exactly the rows this host fed in, so per-host meter
    updates line up with per-host loader stripes."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(
            multihost_utils.global_array_to_host_local_array(x, mesh, P(DATA_AXIS))
        ),
        tree,
    )


def replicate_params(mesh: Mesh, params):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)


def opt_state_sharding(mesh: Mesh, opt_state):
    """ZeRO-1 sharding pytree for an optax state: every array leaf is sharded over
    the data axis along its first dp-divisible dimension (Adam's update is
    elementwise, so the split axis is free to choose); scalars and indivisible
    leaves stay replicated. Params remain replicated — XLA computes the update on
    the local moment shard and all-gathers the applied updates, which is exactly
    the ZeRO-1 dataflow (a capability beyond the reference's DDP, SURVEY §2.2)."""
    dp = mesh.shape[DATA_AXIS]
    rep = replicated(mesh)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        for ax, d in enumerate(shape):
            if d >= dp and d % dp == 0:
                spec = [None] * len(shape)
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree_util.tree_map(rule, opt_state)


def fsdp_param_sharding(mesh: Mesh, params, model_parallel: bool = False):
    """ZeRO-3 / FSDP sharding pytree for params (``SOLVER.FSDP``).

    Every weight leaf is sharded over the ``data`` axis along its first
    dp-divisible dimension; XLA all-gathers a layer's params on use in the
    forward/backward and reduce-scatters its gradient into the shard — the
    FSDP dataflow, expressed purely as sharding annotations (per-device
    param + grad + moment memory divided by dp). The reference has no
    param sharding at all (fairscale appears only for activation
    checkpointing, SURVEY §2.2).

    Composes with tensor parallelism: a leaf the Megatron rules shard over
    ``model`` gets ``data`` on its *other* dp-divisible dimension (2-D weight
    sharding); leaves too small to split stay replicated.
    """
    dp = mesh.shape[DATA_AXIS]
    tp_rules = param_sharding_rules(mesh, params, model_parallel=model_parallel)

    def rule(leaf, tp_sharding):
        shape = getattr(leaf, "shape", ())
        spec = list(tp_sharding.spec) + [None] * (len(shape) - len(tp_sharding.spec))
        for ax, d in enumerate(shape):
            if spec[ax] is None and d >= dp and d % dp == 0:
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return tp_sharding

    return jax.tree_util.tree_map(rule, params, tp_rules)


def param_sharding_rules(mesh: Mesh, params, model_parallel: bool = False):
    """Sharding pytree for params. Replicated for DP; with ``model_parallel``, the
    qkv/mlp projection matrices of 768-wide blocks shard their output dim over the
    model axis (Megatron-style column/row split pairs)."""
    if not model_parallel:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, params)

    def rule(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        joined = "/".join(names)
        if leaf.ndim == 2:
            if any(k in joined for k in ("qkv/w", "fc1/w")):
                return NamedSharding(mesh, P(None, MODEL_AXIS))  # column parallel
            if any(k in joined for k in ("proj/w", "fc2/w")):
                return NamedSharding(mesh, P(MODEL_AXIS, None))  # row parallel
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)
