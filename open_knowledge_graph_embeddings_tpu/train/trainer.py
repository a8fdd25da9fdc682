"""Host-side training engine: epoch loop, eval cadence, model selection,
early stopping, checkpoint rotation.

Capability equivalent of the reference Trainer
(reference: openkge/trainer.py:115-487), reshaped for the jitted-step world:
the device work is a single compiled train/eval step (train/step.py); this
class owns everything that is inherently host-side — the data iterator,
optimizer phase switching, patience logic, checkpointing, metrics
accumulation and throughput logging.

Semantics carried over:

* ``epoch`` derived from training steps: ``floor(steps / (len+1)) + 1``
  (reference: openkge/trainer.py:173-175),
* eval every ``eval_freq`` steps and/or every ``eval_epoch_freq`` epochs,
* model selection on ``model_select_metric[0]`` with patience early
  stopping and the three extra triggers (metric above max threshold, below
  min threshold, moving-average relative change below
  ``patience_metric_change``; reference: openkge/trainer.py:420-481),
* gradient accumulation to ``batch_size_for_backward``
  (reference: openkge/trainer.py:229-246),
* items/sec = positives-per-second throughput logging
  (reference: openkge/trainer.py:308).
"""

from __future__ import annotations

import logging
import math
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data.batching import (
    Batch,
    BatchBuilder,
    pad_batches_to_common_shape,
)
from open_knowledge_graph_embeddings_tpu.data.dataset import OneToNMentionRelationDataset
from open_knowledge_graph_embeddings_tpu.models.embedders import TokenEmbedderBase
from open_knowledge_graph_embeddings_tpu.models.model import KGEModel
from open_knowledge_graph_embeddings_tpu.train.checkpoint import CheckpointManager, load_checkpoint
from open_knowledge_graph_embeddings_tpu.train.metrics import MetricResult
from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes
from open_knowledge_graph_embeddings_tpu.train.step import (
    eval_batch_to_arrays,
    make_accum_steps,
    make_eval_step,
    make_scanned_step,
    make_train_step,
    train_batch_to_arrays,
    unpack_eval_stats,
)
from open_knowledge_graph_embeddings_tpu.utils.logging_utils import ResultsLog

logger = logging.getLogger(__name__)


def running_mean(new, old=None, momentum=0.9):
    return new if old is None else momentum * old + (1 - momentum) * new


class Trainer:
    def __init__(
        self,
        args: Dict[str, Any],
        model: KGEModel,
        train_dataset: OneToNMentionRelationDataset,
        validation_dataset: Optional[OneToNMentionRelationDataset],
        save_path: str = ".",
        keep_checkpoints: int = 5,
        mesh=None,
        variables=None,
    ):
        self.args = args
        self.model = model
        self.train_dataset = train_dataset
        self.validation_dataset = validation_dataset

        seed = int(args.get("seed") or 0)
        self.rng_key = jax.random.key(seed if seed > 0 else 0)
        self.variables = variables if variables is not None else model.init(
            jax.random.key(seed if seed > 0 else 0)
        )

        # device mesh: shard tables/candidates over `model`, rows over `data`
        # (config keys use_mesh / model_parallel; single device -> no mesh).
        # In multi-process runs jax.devices() is the GLOBAL device list, so
        # the mesh spans hosts and XLA routes collectives over ICI/DCN.
        if mesh is None and args.get("use_mesh", True) and len(jax.devices()) > 1:
            from open_knowledge_graph_embeddings_tpu.parallel import default_mesh

            mesh = default_mesh(model_parallel=int(args.get("model_parallel") or 1))
        self.mesh = mesh
        self.process_count = jax.process_count()
        self.process_index = jax.process_index()
        if self.process_count > 1:
            assert self.mesh is not None, "multi-process runs need a device mesh"
            logger.info(
                "multi-host: process %d/%d, %d local of %d global devices",
                self.process_index, self.process_count,
                len(jax.local_devices()), len(jax.devices()),
            )
        if self.mesh is not None:
            from open_knowledge_graph_embeddings_tpu.parallel import variables_shardings

            self.variables = jax.device_put(
                self.variables, variables_shardings(self.variables, self.mesh)
            )
            # mesh-aware encode regions: split candidate/query encodes, run
            # sequence-encoder cores in shard_map so the per-shard work
            # actually shrinks with the mesh (models/model.py set_mesh)
            model.set_mesh(self.mesh)
            logger.info("device mesh: %s", dict(self.mesh.shape))

        self.loss_type = args.get("experiment_settings", {}).get("loss", "bce")
        self.label_smoothing = float(args.get("bce_label_smoothing") or 0.0)
        grad_clip = args.get("grad_clip")
        self.grad_clip = float(grad_clip) if grad_clip else None

        frozen = args.get("resume_freeze") or []
        if isinstance(frozen, str):
            frozen = [frozen]
        self.regimes = OptimizerRegimes(
            args["optimization_config"], args.get("lr_scheduler_config"),
            frozen_patterns=frozen,
        )
        self.regimes.update(1, 0)

        # row-sparse table updates (embedder config `sparse: true`;
        # reference: openkge/model.py:390-391 sparse=True embedding grads)
        self.sparse = bool(getattr(model.embedder, "sparse", False))
        self._sparse_plan = None
        if self.sparse:
            from open_knowledge_graph_embeddings_tpu.train.sparse import (
                SparsePlanBuilder,
                sparse_table_names,
            )

            entity_sparse = bool(train_dataset.use_batch_shared_entities)
            if not sparse_table_names(model.embedder, entity_sparse):
                logger.warning("sparse=true has no sparse-capable tables; using dense path")
                self.sparse = False
            else:
                self._sparse_plan = SparsePlanBuilder(
                    model.embedder, entity_sparse,
                    min_rows_ratio=float(args.get("sparse_min_ratio", 12.0)),
                    # the gather-sum token-table backward plan composes with
                    # meshes: under GSPMD the in-jit length sort is over the
                    # GLOBAL batch, replicated collate gives every host that
                    # global batch, and the host plan replicates the same
                    # sort — so the plan's global time-major positions stay
                    # valid (mesh equality pinned by
                    # tests/test_multichip.py::test_sparse_grad_plan_on_mesh).
                    # The sparse_grad_plan config key can force it off when
                    # the host-side plan build is the bottleneck.
                    grad_plan=bool(args.get("sparse_grad_plan", True)),
                    mesh=self.mesh,
                )
                logger.info(
                    "row-sparse updates for tables %s (entity_sparse=%s)",
                    self._sparse_plan.tables, entity_sparse,
                )
        self.opt_state = self.regimes.init_state(self.variables["params"])
        if self.mesh is not None:
            from open_knowledge_graph_embeddings_tpu.parallel import (
                opt_state_shardings,
                variables_shardings,
            )

            self.opt_state = jax.device_put(
                self.opt_state,
                opt_state_shardings(
                    self.opt_state, variables_shardings(self.variables, self.mesh), self.mesh
                ),
            )
            # pure-DP meshes: shard the candidate encode over the data axis
            # (model_parallel == 1 leaves nothing else sharding it — the
            # strong-scaling floor documented in RESULTS.md)
            from open_knowledge_graph_embeddings_tpu.parallel.mesh import (
                DATA_AXIS,
                MODEL_AXIS,
            )

            if (
                self.mesh.shape[MODEL_AXIS] == 1
                and self.mesh.shape[DATA_AXIS] > 1
                and train_dataset.use_batch_shared_entities
            ):
                model.set_dp_candidate_sharding(self.mesh)
                logger.info(
                    "pure-DP mesh: candidate encode sharded over %d data shards",
                    self.mesh.shape[DATA_AXIS],
                )
        self._rebuild_steps()

        self.train_builder = BatchBuilder(train_dataset, seed=seed)

        # host-sharded evaluation: when every model-axis group of the mesh is
        # process-local (the default layout), each host evaluates a disjoint
        # strided slice of the eval set on a host-local sub-mesh and the
        # metric sums are reduced across processes at the end of evaluate()
        self._local_eval_mesh = None
        val_shard = None
        if self.process_count > 1:
            from open_knowledge_graph_embeddings_tpu.parallel.distributed import (
                local_eval_mesh,
            )

            self._local_eval_mesh = local_eval_mesh(self.mesh)
            if self._local_eval_mesh is not None:
                val_shard = (self.process_index, self.process_count)
                logger.info(
                    "host-sharded eval: local mesh %s, shard %s",
                    dict(self._local_eval_mesh.shape), val_shard,
                )
            else:
                logger.warning(
                    "model-axis groups span hosts: every host evaluates the FULL "
                    "eval set (0%% eval scaling — an eval pass costs "
                    "num_hosts x the host-sharded layout).  Use a mesh whose "
                    "model axis fits within one host (default_mesh does this: "
                    "model_parallel <= local device count, e.g. "
                    "model_parallel=%d here) to restore host-sharded eval.",
                    max(1, jax.local_device_count()),
                )
        # full-vocab eval: score eval_block_rows prefixes per device batch
        # to amortize the candidate-cache HBM sweep (per-prefix metrics are
        # batch-size-invariant; batch-shared eval keeps the protocol batch
        # because its candidate set depends on batch composition)
        eval_bs = None
        eval_block = int(args.get("eval_block_rows") or 0)
        if (
            validation_dataset is not None
            and eval_block > validation_dataset.batch_size
            and not validation_dataset.use_batch_shared_entities
        ):
            eval_bs = eval_block
            logger.info(
                "full-vocab eval device batch: %d rows (protocol batch %d)",
                eval_block, validation_dataset.batch_size,
            )
        self.val_builder = (
            BatchBuilder(validation_dataset, batch_size=eval_bs, host_shard=val_shard)
            if validation_dataset is not None
            else None
        )

        self._eval_batches_cache = None
        self.ckpt = CheckpointManager(save_path, keep_checkpoints)
        # every rank tracks result rows (they feed checkpoint meta and the
        # early-stopping state, which must stay in lockstep), but only rank 0
        # writes results.csv — a shared experiment_dir must not be clobbered
        # by concurrent ranks (same policy as checkpoint writes below)
        self.results = ResultsLog(f"{save_path}/results.csv")
        self.save_path = save_path

        self.training_steps = 0
        self.len_train_batches = max(len(self.train_builder), 1)
        if "mr" in (args.get("model_select_metric") or []):
            # the reference registers mean-rank as greater-is-better
            # (utils/metrics.py:58), carried over for parity — selecting on
            # it therefore prefers the WORST checkpoint
            logger.warning(
                "model_select_metric includes 'mr', which is registered "
                "greater-is-better for reference parity (utils/metrics.py:58): "
                "model selection will prefer the HIGHEST mean rank. "
                "Use 'mrr' for sane selection."
            )
        self.terminate = False
        self.terminate_epochs = args.get("patience_epochs", 50)
        self.best_validation_results = MetricResult()
        self.last_validation_metric = None
        self.moving_average_metric_change = None

        bsz = train_dataset.batch_size
        bsfb = args.get("batch_size_for_backward") or train_dataset.batch_size_for_backward
        self.accum_steps = max(1, int(round((bsfb or bsz) / bsz)))
        # accumulation state carries across epoch boundaries
        # (reference: openkge/trainer.py:229-246)
        self._acc_grads = None
        self._accum_i = 0
        self._window_buf: List[Batch] = []  # sparse path: pending window batches
        if self.accum_steps > 1:
            logger.info(
                "gradient accumulation over %d micro-batches%s",
                self.accum_steps,
                " (row-sparse union-row windows)" if self.sparse else "",
            )
        # multi-step dispatch (train_scan_steps > 1): lax.scan K optimizer
        # steps per device program to amortize the fixed per-dispatch round
        # trip of remote-attached TPUs (see step.make_scanned_step).  The
        # window must be semantics-neutral, so it is disabled when anything
        # needs per-step host control: gradient accumulation (its window
        # machinery already owns the step cadence), device meshes (batch
        # placement uses per-leaf shardings without a window axis), or
        # step-keyed optimizer phase triggers (a phase could switch inside
        # a window).
        self.scan_steps = max(1, int(args.get("train_scan_steps", 1) or 1))
        if self.scan_steps > 1:
            step_phases = any(
                "step" in p for phases in self.regimes.regimes for p in phases
            )
            if self.accum_steps > 1 or self.mesh is not None or step_phases:
                logger.info(
                    "train_scan_steps=%d disabled (%s)",
                    self.scan_steps,
                    "gradient accumulation" if self.accum_steps > 1
                    else "device mesh" if self.mesh is not None
                    else "step-keyed optimizer phases",
                )
                self.scan_steps = 1
            else:
                logger.info("multi-step dispatch: %d steps/program", self.scan_steps)
                self.train_step_scan = make_scanned_step(self.train_step, self.scan_steps)

    # ------------------------------------------------------------------ setup

    def _rebuild_steps(self):
        if self.sparse:
            from open_knowledge_graph_embeddings_tpu.train.sparse import (
                make_sparse_train_step,
            )

            self.train_step = make_sparse_train_step(
                self.model,
                self.regimes,
                self.variables["params"],
                entity_sparse=self._sparse_plan.entity_sparse,
                loss_type=self.loss_type,
                label_smoothing=self.label_smoothing,
                grad_clip=self.grad_clip,
            )
        else:
            self.train_step = make_train_step(
                self.model,
                self.regimes,
                self.variables["params"],
                loss_type=self.loss_type,
                label_smoothing=self.label_smoothing,
                grad_clip=self.grad_clip,
            )
        if getattr(self, "scan_steps", 1) > 1:
            self.train_step_scan = make_scanned_step(self.train_step, self.scan_steps)
        if self.sparse:
            from open_knowledge_graph_embeddings_tpu.train.sparse import (
                make_sparse_accum_steps,
            )

            self.zero_grads, self.grad_step, self.apply_step = make_sparse_accum_steps(
                self.model,
                self.regimes,
                self.variables["params"],
                entity_sparse=self._sparse_plan.entity_sparse,
                loss_type=self.loss_type,
                label_smoothing=self.label_smoothing,
                grad_clip=self.grad_clip,
            )
        else:
            self.zero_grads, self.grad_step, self.apply_step = make_accum_steps(
                self.model,
                self.regimes,
                self.variables["params"],
                loss_type=self.loss_type,
                label_smoothing=self.label_smoothing,
                grad_clip=self.grad_clip,
            )
        self.eval_step = make_eval_step(self.model, self.loss_type, self.label_smoothing)
        self._eval_step_topk = None  # built lazily when log_predictions is set

    @property
    def epoch(self) -> int:
        return math.floor(self.training_steps / (self.len_train_batches + 1)) + 1

    def _put_batch(self, arrays):
        """Place a host-built batch onto the device(s) from the PREFETCH
        threads (this runs inside the batches() transform).

        Single device: one batched ``jax.device_put`` of the whole dict —
        measured 2.9 ms vs 7.7 ms when the ~23 numpy arrays transfer
        individually at jit-dispatch time on the main thread (each array is
        its own synchronous RPC over a remote-TPU link); with the transfer
        on the workers the main loop's dispatch drops to ~0.1 ms.

        Mesh: place onto the sharding plan (rows over ``data``, candidates
        over ``model``) — without this XLA reshards the default placement
        every step.  In multi-process runs every host built the identical
        global batch and materializes only its local shards."""
        if self.mesh is None:
            return jax.device_put(arrays)
        from open_knowledge_graph_embeddings_tpu.parallel import train_batch_shardings
        from open_knowledge_graph_embeddings_tpu.parallel.distributed import put_global_batch

        return put_global_batch(arrays, train_batch_shardings(arrays, self.mesh))

    def _put_eval_batch(self, arrays, eval_mesh):
        """Place an eval batch for the mesh it will run under.  Host-sharded
        eval runs on the host-local sub-mesh — every device is addressable,
        so a plain sharded device_put suffices (no cross-process global
        arrays)."""
        if eval_mesh is None:
            return arrays
        if eval_mesh is self.mesh:
            return self._put_batch(arrays)
        from open_knowledge_graph_embeddings_tpu.parallel import train_batch_shardings

        return jax.device_put(arrays, train_batch_shardings(arrays, eval_mesh))

    def _hp(self):
        # cached on the hparam VALUES: rebuilding per step device-puts ~10
        # fresh scalars per step, and the remote-TPU path charges a round
        # trip per transfer; values only change at phase/scheduler
        # boundaries.  hp is not donated by the steps, so reuse is safe.
        vals = tuple(tuple(sorted(h.items())) for h in self.regimes.hparams())
        if getattr(self, "_hp_cache_key", None) != vals:
            self._hp_cache_key = vals
            self._hp_cache = [
                {k: jnp.float32(v) for k, v in h.items()}
                for h in self.regimes.hparams()
            ]
        return self._hp_cache

    # ------------------------------------------------------------------ train

    def train_epoch(self, val_hook=None) -> MetricResult:
        """One pass over the training data; calls ``val_hook()`` at
        ``eval_freq`` step boundaries."""
        metric_result = MetricResult()
        items_meter_n = 0.0
        items_meter_t = 1e-9
        epoch_start = time.time()
        batch_start = time.time()
        eval_freq = self.args.get("eval_freq") or 0
        print_freq = self.args.get("print_freq") or 100
        save_freq = self.args.get("save_freq") or -1

        n_batches = len(self.train_builder)
        if n_batches == 0:
            # without this the run() epoch loop spins forever: the epoch
            # counter derives from training_steps, which never advances
            raise ValueError(
                "training builder produced 0 batches — check train_data_config "
                "(input_file, batch_size) against the dataset"
            )
        self.len_train_batches = max(n_batches, 1)
        profile_steps = int(self.args.get("profile_steps") or 0)
        # Device stats are fetched lazily in one stacked transfer at print /
        # hook boundaries: the remote-TPU path charges a round trip per
        # fetched scalar, which would otherwise dominate small steps.
        pending: List = []

        def drain_pending():
            nonlocal items_meter_n
            if not pending:
                return
            # one transfer for the whole backlog; scan-window entries carry
            # [K]-stacked stats and a K-list of normalizers, single steps a
            # scalar and a 1-list
            stacked = np.asarray(
                jnp.concatenate(
                    [
                        jnp.stack(
                            [jnp.ravel(s["loss_sum"]), jnp.ravel(s["normalizer_metric"])],
                            axis=1,
                        )
                        for s, _ in pending
                    ]
                )
            )
            i = 0
            for _, norms in pending:
                for norm_loss in norms:
                    loss_sum, n_pos = stacked[i]
                    i += 1
                    metric_result["loss"].update(float(loss_sum) / norm_loss, norm_loss)
                    items_meter_n += float(n_pos)
            pending.clear()

        workers = int(self.args.get("workers", 8))  # reference: scripts/train.py:95
        # one key block per epoch, fetched to the host: the per-step
        # jax.random.split was a separate tiny device execution per step,
        # and the remote-TPU path charges a fixed per-execution round trip
        # (measured ~5-10 ms) — per-step keys now ride into the train step
        # as plain uint32[2] rows with zero extra executions
        epoch_keys = jax.random.split(self.rng_key, n_batches + 2)
        self.rng_key = epoch_keys[0]
        try:
            host_keys = np.asarray(jax.random.key_data(epoch_keys[1:]))
        except TypeError:  # legacy raw uint32 keys
            host_keys = np.asarray(epoch_keys[1:])
        step_i = -1
        for entry in self._iter_train_entries(workers=workers, prefetch=max(2, workers)):
            if entry[0] == "s":
                _, batch, arrays = entry
                wbatches = [batch]
            else:
                _, wbatches, arrays = entry
            k = len(wbatches)
            prev_step_i, step_i = step_i, step_i + k
            if profile_steps and self.training_steps == 1:
                jax.profiler.start_trace(f"{self.save_path}/profile")
                self._profiling_until = self.training_steps + profile_steps
            if profile_steps and getattr(self, "_profiling_until", None) is not None \
                    and self._profiling_until <= self.training_steps:
                jax.profiler.stop_trace()
                logger.info("wrote profiler trace to %s/profile", self.save_path)
                self._profiling_until = None
                profile_steps = 0
            self.training_steps += k
            if self.regimes.update(self.epoch, self.training_steps - k + 1):
                # optimizer type changed: fresh state + rebuilt step
                # (scan windows never contain a phase switch: step-keyed
                # phases disable scan mode, and epoch-keyed switches only
                # fire on an epoch's first entry)
                self.opt_state = self.regimes.init_state(self.variables["params"])
                self._rebuild_steps()

            # host-side row(s) of the per-epoch key block (raw uint32[2]
            # keys are accepted by every jax.random consumer); a partial
            # epoch consumes a prefix and the next epoch draws a fresh
            # block.  A scan window consumes exactly the rows its K single
            # steps would have.
            sub = host_keys[(prev_step_i + 1) % len(host_keys)]
            if entry[0] == "w":
                rows = np.stack(
                    [host_keys[i % len(host_keys)] for i in range(prev_step_i + 1, step_i + 1)]
                )
                self.variables, self.opt_state, stats = self.train_step_scan(
                    self.variables, self.opt_state, self._hp(), arrays, rows
                )
            elif self.accum_steps <= 1:
                self.variables, self.opt_state, stats = self.train_step(
                    self.variables, self.opt_state, self._hp(), arrays, sub
                )
            else:
                if self._acc_grads is None:
                    # the sparse accumulator is shaped by the window's
                    # union-row plan; the dense one by the params alone
                    self._acc_grads = (
                        self.zero_grads(arrays) if self.sparse else self.zero_grads()
                    )
                self.variables, self._acc_grads, stats = self.grad_step(
                    self.variables, self._acc_grads, arrays, sub
                )
                self._accum_i += 1
                if self._accum_i == self.accum_steps:
                    if self.sparse:
                        # any micro-batch of the window carries the shared
                        # union plan; the last one is in hand
                        self.variables, self.opt_state = self.apply_step(
                            self.variables, self.opt_state, self._acc_grads,
                            arrays, self._hp(),
                        )
                    else:
                        self.variables, self.opt_state = self.apply_step(
                            self.variables, self.opt_state, self._acc_grads, self._hp()
                        )
                    self._acc_grads = None
                    self._accum_i = 0
            pending.append((stats, [b.normalizer_loss for b in wbatches]))
            dt = time.time() - batch_start
            items_meter_t += dt
            batch_start = time.time()

            # cadence triggers fire when an entry CROSSES a multiple of the
            # frequency (identical to ``step_i % freq == 0`` for single
            # steps; a scan window fires at its last step)
            def crossed(freq):
                return freq > 0 and step_i > 0 and (step_i // freq) != (prev_step_i // freq)

            last = step_i >= n_batches - 1
            if crossed(print_freq) or last:
                drain_pending()
                logger.info(
                    "TRAINING - EPOCH [%3d][%6d/%d]  time: %7.3f  items/sec: (%.0f)  loss: %.7f",
                    self.epoch,
                    step_i,
                    n_batches,
                    time.time() - epoch_start,
                    items_meter_n / items_meter_t,
                    metric_result["loss"].avg,
                )
            if crossed(save_freq):
                drain_pending()
                self.save(wait=False)
            if val_hook is not None and crossed(eval_freq):
                drain_pending()
                val_hook(last_step_of_epoch=False)
        drain_pending()
        return metric_result

    def _iter_train_arrays(self, workers: int, prefetch: int):
        """Yield ``(batch, device arrays)`` for one training pass.

        Plain and per-batch-sparse modes convert on the prefetch threads
        (the sparse plan does its unique+remap pass there).  Sparse +
        gradient accumulation instead groups ``accum_steps`` batches into a
        UNION-row window (SparsePlanBuilder.plan_window) — planning runs on
        the consumer thread once per window, and a partial window at the
        end of an epoch carries over to the next one (matching the dense
        path's cross-epoch accumulation state)."""
        if not (self.sparse and self.accum_steps > 1):
            to_arrays = self._sparse_plan if self.sparse else train_batch_to_arrays
            transform = lambda b: (b, self._put_batch(to_arrays(b)))
            yield from self.train_builder.batches(
                shuffle=True, prefetch=prefetch, transform=transform, workers=workers
            )
            return
        for batch in self.train_builder.batches(
            shuffle=True, prefetch=prefetch, workers=workers
        ):
            self._window_buf.append(batch)
            if len(self._window_buf) == self.accum_steps:
                window, self._window_buf = self._window_buf, []
                for b, d in zip(window, self._sparse_plan.plan_window(window)):
                    yield b, self._put_batch(d)

    def _iter_train_entries(self, workers: int, prefetch: int):
        """Yield training-loop entries: ``("s", batch, device_arrays)`` for
        single steps, ``("w", [batches], stacked_device_arrays)`` for
        multi-step scan windows (``train_scan_steps`` > 1; see
        step.make_scanned_step)."""
        if self.scan_steps <= 1:
            for batch, arrays in self._iter_train_arrays(workers, prefetch):
                yield "s", batch, arrays
            return
        to_arrays = self._sparse_plan if self.sparse else train_batch_to_arrays
        src = self.train_builder.batches(
            shuffle=True,
            prefetch=prefetch,
            transform=lambda b: (b, to_arrays(b)),
            workers=workers,
        )
        yield from self._window_entries(src)

    def _window_entries(self, src):
        """Group host-built ``(batch, arrays)`` pairs into windows of
        ``self.scan_steps``: np.stack each leaf and push the whole window to
        the device in ONE batched transfer, on a dedicated thread so the
        dispatch loop never blocks on stacking or transfer (inline stacking
        would serialize ~0.5-1 ms/step of host work into the dispatch path).

        Batches whose array signature differs from the window's (e.g. a
        sparse batch whose per-batch gate fell back to dense tables changes
        the key set) and the end-of-epoch tail flush as single-step
        entries — only two device programs ever exist (the K-window and the
        single step)."""
        import queue
        import threading

        k = self.scan_steps
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()  # consumer gone: unblock + end the producer

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def item_of(batch, arrays):
            arrays = {n: np.asarray(a) for n, a in arrays.items()}
            sig = tuple(sorted((n, a.shape, str(a.dtype)) for n, a in arrays.items()))
            return batch, arrays, sig

        def producer():
            buf = []
            try:
                def flush(singles):
                    for b, a, _ in singles:
                        if not put(("s", b, self._put_batch(a))):
                            return

                for batch, arrays in src:
                    if stop.is_set():
                        return
                    it = item_of(batch, arrays)
                    if buf and it[2] != buf[0][2]:
                        flush(buf)
                        buf = []
                    buf.append(it)
                    if len(buf) == k:
                        stacked = {
                            n: np.stack([a[n] for _, a, _ in buf])
                            for n in buf[0][1]
                        }
                        if not put(("w", [b for b, _, _ in buf], self._put_batch(stacked))):
                            return
                        buf = []
                flush(buf)
            except BaseException as e:  # surface to the consumer
                put(e)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # early consumer exit (error, break, generator close): release
            # the producer so it doesn't block forever on a full queue
            stop.set()
            while not q.empty():
                q.get_nowait()

    # ------------------------------------------------------------------- eval

    def _candidate_cache(self, variables, mesh):
        """Precompute the [N, d] candidate matrix for full-vocab eval.

        Token embedders always need it (reference: openkge/model.py:670-712).
        Lookup embedders get one at large vocabularies too: handing the
        encoded table slice to the eval step routes it through the
        chunked-scan formulation (train/evaluate.py eval_stats_chunked)
        instead of the dense [B, N] path."""
        ds = self.validation_dataset
        if ds is None or ds.use_batch_shared_entities:
            return None
        if isinstance(self.model.embedder, TokenEmbedderBase):
            all_emb = self.model.encode_all_entities(variables, mesh=mesh)
            return all_emb[self.model.meta.min_entities_size :]
        if self.model.meta.entities_size > 200_000:
            emb, _, _ = self.model.encode_candidates(variables, None, train=False)
            return emb
        return None

    def _eval_context(self):
        """(variables, mesh) the eval step should run under: host-local views
        on the host-local sub-mesh when eval is host-sharded, else the
        training placement."""
        if self._local_eval_mesh is None:
            return self.variables, self.mesh
        from open_knowledge_graph_embeddings_tpu.parallel import variables_shardings
        from open_knowledge_graph_embeddings_tpu.parallel.distributed import (
            variables_to_host_local,
        )

        local = variables_to_host_local(
            self.variables, self.mesh, variables_shardings(self.variables, self.mesh)
        )
        local = jax.device_put(local, variables_shardings(local, self._local_eval_mesh))
        return local, self._local_eval_mesh

    def _eval_batches(self, builder: BatchBuilder):
        """Eval batches are deterministic: build once, pad to a common shape
        (single jit compilation), reuse every eval pass.  Batch-shared eval
        resamples negatives per pass, so only full-vocab eval is cached."""
        if builder is not self.val_builder or builder.ds.use_batch_shared_entities:
            return builder.batches(shuffle=False, prefetch=2)
        if self._eval_batches_cache is None:
            self._eval_batches_cache = pad_batches_to_common_shape(
                list(builder.batches(shuffle=False))
            )
        return self._eval_batches_cache

    #: order of the host-side eval accumulation vector: the 7 packed device
    #: stats (count, summed rank metrics, loss_sum, normalizer_metric) plus
    #: the host-side loss normalizer
    _EVAL_SUM_KEYS = ("count", "mrr", "mr", "h50", "h10", "h3", "h1", "loss_sum")

    def evaluate(self, builder: Optional[BatchBuilder] = None) -> MetricResult:
        builder = builder or self.val_builder
        assert builder is not None, "no validation dataset"
        eval_vars, eval_mesh = self._eval_context()
        cand_emb = self._candidate_cache(eval_vars, eval_mesh)
        t0 = time.time()
        log_preds = bool(self.args.get("log_predictions"))
        if log_preds and self._eval_step_topk is None:
            self._eval_step_topk = make_eval_step(
                self.model, self.loss_type, self.label_smoothing,
                topk=int(self.args.get("log_predictions_topk") or 10),
            )
        step_fn = self._eval_step_topk if log_preds else self.eval_step
        pred_file = None
        if log_preds:
            suffix = f".p{self.process_index}" if self.process_count > 1 else ""
            pred_file = open(
                f"{self.save_path}/predictions_step{self.training_steps}{suffix}.tsv", "w"
            )
            pred_file.write("direction\tent_id\trel_id\ttop_entity_ids\ttop_scores\n")
        # local sums, reduced across processes at the end (host-sharded eval)
        sums = np.zeros(len(self._EVAL_SUM_KEYS) + 1, dtype=np.float64)
        n_batches = 0
        pending = []  # (async device stats, normalizer_loss, optional pred payload)

        def drain():
            for packed, normalizer_loss, preds in pending:
                stats = unpack_eval_stats(packed)
                for j, k in enumerate(self._EVAL_SUM_KEYS):
                    sums[j] += stats[k]
                sums[-1] += normalizer_loss
                if preds is not None:
                    self._write_predictions(pred_file, *preds)
            pending.clear()

        for batch in self._eval_batches(builder):
            arrays = self._put_eval_batch(eval_batch_to_arrays(batch), eval_mesh)
            n_batches += 1
            if cand_emb is not None:
                out = step_fn(eval_vars, arrays, cand_emb)
            else:
                out = step_fn(eval_vars, arrays)
            if log_preds:
                packed, top_scores, top_cols = out
                preds = (batch, top_scores, top_cols)
            else:
                packed, preds = out, None
            # keep dispatch async so device work and host batch prep overlap,
            # but bound the number of live device buffers (a 59k-batch
            # OLPBench test pass would otherwise hold 59k tiny arrays)
            pending.append((packed, batch.normalizer_loss, preds))
            if len(pending) >= 512:
                drain()
        drain()
        if pred_file is not None:
            pred_file.close()
            logger.info("wrote predictions to %s", pred_file.name)
        if self.process_count > 1:
            from open_knowledge_graph_embeddings_tpu.parallel.distributed import (
                all_processes_sum,
            )

            sums = all_processes_sum(sums)
        totals = dict(zip(self._EVAL_SUM_KEYS, sums))
        result = MetricResult()
        cnt = totals["count"]
        if cnt > 0:
            for m in ("mrr", "mr", "h1", "h3", "h10", "h50"):
                result[m].update(totals[m] / cnt, cnt)
        norm_loss = sums[-1]
        if norm_loss > 0:
            result["loss"].update(totals["loss_sum"] / norm_loss, norm_loss)
        logger.info(
            "EVALUATING - EPOCH [%3d]  time: %7.3f  local batches: %d  METRICS  %s",
            self.epoch, time.time() - t0, n_batches, result.averages,
        )
        return result

    def _write_predictions(self, f, batch: Batch, top_scores, top_cols) -> None:
        """One TSV row per real prefix: filtered top-k entity ids + scores."""
        top_scores = np.asarray(top_scores)
        top_cols = np.asarray(top_cols)
        if batch.candidate_ids is not None:
            ent_of_col = np.asarray(batch.candidate_ids)
            top_ents = ent_of_col[np.clip(top_cols, 0, len(ent_of_col) - 1)]
        else:
            top_ents = top_cols + batch.cand_offset
        for i in range(batch.num_rows):
            direction = "sp" if batch.is_sp[i] else "po"
            ids = " ".join(str(e) for e in top_ents[i])
            scs = " ".join(f"{s:.4f}" for s in top_scores[i])
            f.write(f"{direction}\t{batch.ent_ids[i]}\t{batch.rel_ids[i]}\t{ids}\t{scs}\n")

    # ------------------------------------------------------ selection logic

    def _check_early_stopping(self, validation_results: MetricResult, results_row: Dict):
        args = self.args
        one_improved = False
        metric_improved = {}
        best_tags: List[str] = []
        for name, meter in validation_results.items():
            metric_improved[name] = False
            if meter.avg_better_than(self.best_validation_results[name]):
                if name in args["model_select_metric"]:
                    best_tags.append(name)
                    one_improved = True
                self.best_validation_results[name] = meter
                metric_improved[name] = True
            results_row[f"validation_{name}"] = meter.avg

        select = args["model_select_metric"][0]
        if self.last_validation_metric is None:
            self.last_validation_metric = validation_results[select]
        elif validation_results[select].avg > 0:
            self.moving_average_metric_change = running_mean(
                math.fabs(
                    (self.last_validation_metric.avg - validation_results[select].avg)
                    / validation_results[select].avg
                ),
                self.moving_average_metric_change,
            )

        exceeds_max = bool(args.get("patience_metric_max_treshold")) and validation_results[
            select
        ].avg_better_than_float(args["patience_metric_max_treshold"])
        below_min = bool(args.get("patience_metric_min_treshold")) and not validation_results[
            select
        ].avg_better_than_float(args["patience_metric_min_treshold"])
        minimal_change = (
            bool(args.get("patience_metric_change"))
            and self.moving_average_metric_change is not None
            and self.moving_average_metric_change < args["patience_metric_change"]
        )

        if exceeds_max or below_min or minimal_change or not metric_improved[select]:
            reasons = [
                r
                for r, f in [
                    ("metric_exceeds_critical_treshold", exceeds_max),
                    ("metric_not_achieving_critical_treshold", below_min),
                    ("metric_has_minimal_change", minimal_change),
                    ("metric has not improved", not metric_improved[select]),
                ]
                if f
            ]
            logger.info(
                "Loosing patience with %s in epoch %d because %s",
                select, self.epoch, " and ".join(reasons),
            )
            if self.epoch >= self.terminate_epochs:
                self.terminate = True
        else:
            self.terminate_epochs = self.epoch + args["patience_epochs"]

        self.regimes.lr_scheduler_step(
            validation_results[select].avg,
            greater_is_better=validation_results[select].greater_is_better,
            epoch=self.epoch,
        )
        return one_improved, best_tags

    # -------------------------------------------------------------- run loop

    def run(self):
        """Train until epochs exhausted or early stopping fires."""
        epochs = self.args.get("epochs", 100)
        eval_epoch_freq = self.args.get("eval_epoch_freq") or 0
        save_epoch_freq = self.args.get("save_epoch_freq") or 0

        def val_hook(last_step_of_epoch: bool):
            if self.val_builder is None:
                return
            validation_results = self.evaluate()
            row = {
                "epoch": self.epoch,
                "training_steps": self.training_steps,
            }
            improved, tags = self._check_early_stopping(validation_results, row)
            if last_step_of_epoch and save_epoch_freq and self.epoch % save_epoch_freq == 0:
                self.save(
                    save_all=True, is_best=improved, tags=tags if improved else None,
                    wait=False,
                )
            self.results.add(**row)
            self.save_results()

        while self.epoch < epochs and not self.terminate:
            train_result = self.train_epoch(val_hook=val_hook)
            row = {
                "epoch": self.epoch,
                "training_steps": self.training_steps,
                "training_loss": train_result["loss"].avg,
            }
            self.results.add(**row)
            if self.val_builder is not None and (
                eval_epoch_freq and self.epoch % eval_epoch_freq == 0
            ):
                val_hook(last_step_of_epoch=True)
            self.save_results()
        # always leave a resumable checkpoint at the end of a run
        if self.training_steps > 0:
            self.save()
        self.ckpt.wait_finalized()

    # ---------------------------------------------------------- persistence

    def save_results(self):
        """Write results.csv (rank 0 only — ranks share one experiment_dir)."""
        if self.process_index == 0:
            self.results.save()

    def save(self, is_best=False, tags=None, save_all=False, wait=True):
        """Checkpoint now.  ``wait=False`` (used by the in-loop save sites)
        returns as soon as the device->host fetch is done and lets the file
        write, rotation and best-copies run on a background thread."""
        meta = {
            "epoch": self.epoch,
            "training_steps": self.training_steps,
            "config": _jsonable(self.args),
            "optimizer_host_state": self.regimes.host_state(),
            "results": self.results.to_dicts(),
        }
        if self.process_count > 1:
            # per-shard collective save: every process writes only the
            # shards it owns to the shared experiment dir — no
            # replicate-to-all-chips gather (which at the north-star scale
            # would materialize ~10 GB of sharded tables on every chip)
            return self.ckpt.save_sharded(
                self.variables, self.opt_state, meta, self.process_index,
                is_best=is_best, tags=tags, save_all=save_all,
            )
        path = self.ckpt.save(
            self.variables, self.opt_state, meta,
            is_best=is_best, tags=tags, save_all=save_all,
        )
        if wait:
            self.ckpt.wait()
        return path

    def load(
        self,
        path: str,
        reset_optimizer: bool = False,
        resume_filter=None,
        freeze_param=None,
        weight_map=None,
        dont_load_optimizer: bool = False,
    ):
        from open_knowledge_graph_embeddings_tpu.train.checkpoint import load_checkpoint_meta

        self.ckpt.wait_finalized()  # a just-scheduled async write may target this path
        # restore the optimizer phase first: a restored phase may use a
        # different optimizer type than phase 0, which changes the shape of
        # the optimizer state and the compiled update rule
        pre_meta = load_checkpoint_meta(path)
        host = pre_meta.get("optimizer_host_state")
        if host:
            old_names = self.regimes.opt_names()
            self.regimes.load_host_state(host, reset=reset_optimizer)
            if self.regimes.opt_names() != old_names:
                self.opt_state = self.regimes.init_state(self.variables["params"])
                self._rebuild_steps()

        self.variables, self.opt_state, meta = load_checkpoint(
            path,
            self.variables,
            self.opt_state,
            resume_filter=resume_filter,
            weight_map=weight_map,
            load_optimizer=not (reset_optimizer or dont_load_optimizer),
        )
        if self.mesh is not None:
            # restored leaves arrive with default placement; re-place them on
            # the sharding plan so the first step doesn't reshard everything
            from open_knowledge_graph_embeddings_tpu.parallel import (
                opt_state_shardings,
                variables_shardings,
            )

            var_sh = variables_shardings(self.variables, self.mesh)
            self.variables = jax.device_put(self.variables, var_sh)
            self.opt_state = jax.device_put(
                self.opt_state, opt_state_shardings(self.opt_state, var_sh, self.mesh)
            )
        self.training_steps = int(meta.get("training_steps", 0))
        # restore the per-eval results history (reference: openkge/trainer.py:591-593)
        prior_rows = meta.get("results")
        if prior_rows:
            self.results.rows = list(prior_rows)
            self.save_results()
        if freeze_param:
            patterns = [freeze_param] if isinstance(freeze_param, str) else list(freeze_param)
            new = [p for p in patterns if p not in self.regimes.frozen_patterns]
            if new:
                self.regimes.frozen_patterns.extend(new)
                # keep the just-loaded accumulators for leaves that remain
                # trainable; only newly-frozen leaves get the empty state
                # (reference keeps optimizer state, openkge/trainer.py:532-536)
                loaded_state = self.opt_state
                fresh = self.regimes.init_state(self.variables["params"])

                def merge(f, l):
                    return l if isinstance(f, dict) and f and isinstance(l, dict) and set(f) == set(l) else f

                self.opt_state = jax.tree_util.tree_map(
                    merge, fresh, loaded_state, is_leaf=lambda x: isinstance(x, dict) and (
                        not x or not any(isinstance(v, dict) for v in x.values())
                    ),
                )
                self._rebuild_steps()
                logger.info("froze parameters matching %s", patterns)
        return meta


def _jsonable(obj):
    import json

    try:
        json.dumps(obj)
        return obj
    except TypeError:
        if isinstance(obj, dict):
            return {k: _jsonable(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [_jsonable(v) for v in obj]
        return str(obj)
