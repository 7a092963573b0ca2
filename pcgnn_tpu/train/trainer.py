"""The training orchestrator — equivalent of the reference ``ModelHandler``
(``src/model_handler.py:22-178``), redesigned so one jitted ``lax.scan``
executes an entire epoch on device.

Per epoch (reference ``train()``, ``src/model_handler.py:128-156``):
  1. *pick* a label-balanced sample of 2·|train_pos| nodes (PC-GNN only),
  2. shuffle, split into fixed-size batches (last batch padded + masked),
  3. per batch: loss -> grads -> Adam update (torch-style L2 weight decay).

Validation every ``valid_epochs`` with the reference's relative-gain model
selection rule (``src/model_handler.py:162-169``), patience early stop
(``:170-173``), and restore-best final test (``:175-178``).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pcgnn_tpu.data.loaders import NUM_UNLABELED, load_data
from pcgnn_tpu.data.prep import normalize_features, pos_neg_split, stratified_splits
from pcgnn_tpu.graph.csr import MultiRelGraph
from pcgnn_tpu.models import build_model
from pcgnn_tpu.sampling.pick import pick_probs, pick_step
from pcgnn_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from pcgnn_tpu.train.metrics import evaluate
from pcgnn_tpu.train.results import ResultManager


def torch_adam(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 term added to the gradient *before*
    the moment updates (not decoupled AdamW), betas=(0.9, 0.999), eps=1e-8
    (``src/model_handler.py:124``)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


class Trainer:
    def __init__(self, config: dict, graph: Optional[MultiRelGraph] = None,
                 result: Optional[ResultManager] = None):
        self.config = dict(config)
        cfg = self.config

        # multi-host: ``distributed: true`` initializes jax.distributed
        # BEFORE any backend touch and trains over the
        # ('dcn', 'data', 'graph') mesh (parallel.distributed).  Every
        # process runs the same ``python -m pcgnn_tpu.cli`` with the same
        # config; per-process identity comes from the config
        # (``process_id``), the PCGNN_PROCESS_ID env var, or — on TPU
        # pods — jax's own auto-detection.  This replaces the reference's
        # SSH fleet surface (exp_with_all_server.py:13-35) as the
        # pod-launchable operator entry point.
        self.distributed = bool(cfg.get("distributed"))
        if self.distributed:
            import os

            from pcgnn_tpu.parallel.distributed import ensure_initialized
            pid = cfg.get("process_id")
            if pid is None and os.environ.get("PCGNN_PROCESS_ID") is not None:
                pid = int(os.environ["PCGNN_PROCESS_ID"])
            ensure_initialized(cfg.get("coordinator_address"),
                               cfg.get("num_processes"), pid)

        self.result = result if result is not None else ResultManager(cfg)

        np.random.seed(cfg["seed"])

        if graph is None:
            # "thresholds" (per-relation list, the reference's attribute
            # src/layers.py:52,193) wins over the scalar "threshold"
            thr = cfg.get("thresholds") or cfg.get("threshold", 0.5)
            graph = load_data(cfg["data_name"], cfg.get("data_prefix", "data/"),
                              threshold=thr,
                              graph_id=cfg.get("graph_id"), seed=cfg["seed"])
        labels = np.asarray(graph.labels)

        num_unlabeled = NUM_UNLABELED.get(cfg["data_name"], 0)
        idx_train, idx_valid, idx_test = stratified_splits(
            labels, cfg["train_ratio"], cfg["test_ratio"], cfg["seed"],
            num_unlabeled=num_unlabeled)
        y_train = labels[idx_train]
        train_pos, train_neg = pos_neg_split(idx_train, y_train)

        if cfg["data_name"].startswith("amazon"):
            # amazon-family features are row-normalized (model_handler.py:59-60)
            feats = normalize_features(np.asarray(graph.features))
            graph = MultiRelGraph(relations=graph.relations, homo=graph.homo,
                                  features=jnp.asarray(feats),
                                  labels=graph.labels)

        # edge-window feature stores (one contiguous DMA per window row;
        # graph.csr.attach_edge_windows): materialized AFTER any feature
        # transform.  Under SPMD (num_devices > 1) the store is instead
        # built ROW-BLOCK SHARDED inside parallel.spmd.shard_relations
        # (same layout per block, offsets local to the owning device), so
        # this single-device materialization is skipped there.  Relations
        # over the HBM budget keep the scattered-gather path transparently.
        if (cfg.get("edge_windows", True) and not self.distributed
                and not cfg.get("learn_features")
                and int(cfg.get("num_devices") or 1) == 1):
            from pcgnn_tpu.graph.csr import materialize_edge_windows
            # bfloat16 store by default (TPU-first): the step is
            # window-gather-bound, and halving the store's HBM traffic is
            # the dominant lever.  The stored feature VALUES round, and all
            # SELECTION scores then rank the bf16-rounded snapshot
            # consistently (models.pcgnn sel_round: self-distance stays
            # exactly 0); aggregation/loss accumulation stays f32.
            # ``ewin_dtype: "float32"`` restores bit-exact parity with the
            # scattered-gather path.
            graph = materialize_edge_windows(
                graph, dtype={"bfloat16": jnp.bfloat16,
                              "float32": jnp.float32}[
                    cfg.get("ewin_dtype", "bfloat16")])

        self.graph = graph
        self.idx_train, self.idx_valid, self.idx_test = idx_train, idx_valid, idx_test
        self.y_train = y_train
        self.y_valid, self.y_test = labels[idx_valid], labels[idx_test]
        self.train_pos, self.train_neg = train_pos, train_neg

        model_name = cfg["model"].upper()
        if model_name == "PCGNN":
            self.model = build_model(
                model_name, feat_dim=graph.feat_dim, emb_dim=cfg["emb_size"],
                num_relations=graph.num_relations,
                alpha=cfg.get("alpha", 2.0), rho=cfg.get("rho", 0.5),
                learn_features=bool(cfg.get("learn_features")))
        else:
            self.model = build_model(model_name, feat_dim=graph.feat_dim,
                                     emb_dim=cfg["emb_size"],
                                     num_sample=cfg.get("num_sample"))
        self.model_name = model_name

        self.tx = torch_adam(cfg["lr"], cfg["weight_decay"])

        # SPMD: num_devices > 1 trains over a ('data', 'graph') mesh with
        # the feature table AND the relation structure sharded over 'graph'
        # (parallel.spmd); num_devices == 1 keeps the single-chip path.
        self.num_devices = int(cfg.get("num_devices") or 1)
        self.mesh = None
        if (cfg.get("learn_features")
                and (self.distributed or self.num_devices > 1)):
            raise NotImplementedError(
                "learn_features trains the node table through the dense "
                "mask-GEMM lane, which is single-chip only (the SPMD lanes "
                "assume a frozen sharded table); drop num_devices/"
                "distributed or learn_features")
        if self.distributed:
            from pcgnn_tpu.parallel.distributed import make_multihost_mesh
            self.mesh = make_multihost_mesh(
                graph=int(cfg.get("mesh_graph") or 1),
                data=(int(cfg["mesh_data"]) if cfg.get("mesh_data")
                      else None))
            self.num_devices = int(self.mesh.devices.size)
        elif self.num_devices > 1:
            avail = jax.devices()
            if self.num_devices > len(avail):
                raise ValueError(
                    f"num_devices={self.num_devices} but only {len(avail)} "
                    f"devices are visible")
            from pcgnn_tpu.parallel.mesh import factor_mesh, make_mesh
            dg = cfg.get("mesh_graph")
            if dg:
                dd = self.num_devices // int(dg)
            else:
                dd, dg = factor_mesh(self.num_devices)
            self.mesh = make_mesh(data=dd, graph=int(dg),
                                  devices=avail[: self.num_devices])

        # static epoch plan
        b = int(cfg["batch_size"])
        if self.mesh is not None:
            # batches shard over every data axis (('dcn',) 'data');
            # padded slots weigh 0
            dd = int(np.prod([self.mesh.shape[a]
                              for a in self.mesh.axis_names
                              if a in ("dcn", "data")]))
            if b % dd:
                b = ((b + dd - 1) // dd) * dd
                print(f"Rounded batch_size up to {b} "
                      f"(divisible by the data axes {dd})")
        if model_name == "PCGNN":
            sample_size = 2 * len(train_pos)              # model_handler.py:130
        else:
            sample_size = len(idx_train)
        self.sample_size = max(sample_size, 1)
        self.num_batches = max(-(-self.sample_size // b), 1)
        self.batch_size = b

        # device-resident training constants
        self.idx_train_dev = jnp.asarray(idx_train, jnp.int32)
        deg_train = np.asarray(graph.homo.deg)[idx_train]
        self.pick_weights = pick_probs(jnp.asarray(deg_train),
                                       jnp.asarray(y_train))
        self.train_pos_dev = jnp.asarray(
            train_pos if len(train_pos) else np.zeros(1, np.int64), jnp.int32)
        self.train_pos_valid = jnp.asarray(
            np.ones(max(len(train_pos), 1), bool) if len(train_pos)
            else np.zeros(1, bool))

        self._build_steps()

    # ------------------------------------------------------------------ #

    def _build_steps(self):
        model = self.model
        tx = self.tx
        b, nb, s = self.batch_size, self.num_batches, self.sample_size
        padded = nb * b
        is_pcgnn = self.model_name == "PCGNN"
        is_spmd = self.mesh is not None

        base_key = jax.random.key(self.config["seed"])

        if is_spmd:
            from pcgnn_tpu.parallel.spmd import (
                pad_graph_for_mesh, shard_relation, shard_relations,
                spmd_homo_loss_fn, spmd_homo_predict_fn, spmd_loss_fn,
                spmd_predict_fn)
            x_sharded, n_pad = pad_graph_for_mesh(self.graph, self.mesh)
            ewin_kw = dict(
                edge_windows=bool(self.config.get("edge_windows", True)),
                ewin_dtype={"bfloat16": jnp.bfloat16,
                            "float32": jnp.float32}[
                    self.config.get("ewin_dtype", "bfloat16")])
            if is_pcgnn:
                from pcgnn_tpu.parallel.spmd import build_sharded_fused
                rel_shards = shard_relations(self.graph, self.mesh, n_pad,
                                             **ewin_kw)
                # fused per-node record table (one row gather fetches all
                # relations' windows — the single-chip fast path, sharded)
                fused, fused_off = build_sharded_fused(
                    self.graph, rel_shards, self.mesh, n_pad)
                spmd_loss = spmd_loss_fn(model, self.mesh, n_pad,
                                         rel_shards, fused_off=fused_off)
                spmd_predict = spmd_predict_fn(model, self.mesh, n_pad,
                                               rel_shards,
                                               fused_off=fused_off)
            else:
                # GraphSAGE/GCN aggregate over the homo relation only: one
                # row-block shard, same fast/plain/hub lanes
                feats_np = (np.asarray(self.graph.features)
                            if ewin_kw["edge_windows"] else None)
                rel_shards = shard_relation(
                    self.graph.homo, self.mesh, n_pad, feats_np,
                    edge_windows=ewin_kw["edge_windows"],
                    ewin_dtype=ewin_kw["ewin_dtype"])
                homo_loss = spmd_homo_loss_fn(model, self.mesh, n_pad,
                                              rel_shards)
                homo_predict = spmd_homo_predict_fn(model, self.mesh, n_pad,
                                                    rel_shards)

        # The graph (features + per-relation structure) and the training
        # constants are passed as PYTREE ARGUMENTS, not closed over: a
        # closed-over concrete array is baked into the compiled program as a
        # literal, which (a) bloats the executable to graph size and
        # (b) overflows compile-payload limits at stress scale (1e6+ nodes).
        # As arguments they stay device-resident buffers referenced by
        # handle.  Under SPMD ``graph`` is (x_sharded, rel_shards, labels);
        # the sharded step math lives in ``parallel.spmd``.
        def _loss(params, batch, batch_labels, batch_weight, key, graph,
                  consts):
            if is_spmd:
                xg, shards, _, fused_t = graph
                if not is_pcgnn:
                    return homo_loss(params, xg, shards, batch, batch_labels,
                                     batch_weight, key)
                return spmd_loss(params, xg, shards, batch, batch_labels,
                                 batch_weight, consts["tp"], consts["tpv"],
                                 fused_t)
            if is_pcgnn:
                return model.loss(params, graph, batch, batch_labels,
                                  batch_weight, train_pos=consts["tp"],
                                  train_pos_valid=consts["tpv"],
                                  train_pos_feats=consts["tpf"])
            return model.loss(params, graph, batch, batch_labels,
                              batch_weight, key=key)

        def _epoch(params, opt_state, epoch_idx, graph, consts):
            labels_dev = graph[2] if is_spmd else graph.labels

            def loss_fn(params, batch, batch_labels, batch_weight, key):
                return _loss(params, batch, batch_labels, batch_weight, key,
                             graph, consts)

            # per-epoch key derived from (seed, epoch): deterministic and
            # resumable without threading key state through checkpoints
            key = jax.random.fold_in(base_key, epoch_idx)
            k_pick, k_shuf = jax.random.split(key)
            if is_pcgnn:
                sampled = pick_step(k_pick, consts["idx_train"],
                                    consts["pick_weights"], s)
            else:
                sampled = consts["idx_train"]
            sampled = jax.random.permutation(k_shuf, sampled)
            ids = jnp.concatenate(
                [sampled, jnp.zeros((padded - s,), sampled.dtype)])
            w = jnp.concatenate(
                [jnp.ones((s,), jnp.float32), jnp.zeros((padded - s,), jnp.float32)])
            batches = ids.reshape(nb, b)
            weights = w.reshape(nb, b)

            def step(carry, xs):
                params, opt_state = carry
                batch, bw, k_step = xs
                y = labels_dev[batch]
                loss, grads = jax.value_and_grad(loss_fn)(params, batch, y, bw,
                                                          k_step)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            step_keys = jax.random.split(jax.random.fold_in(key, 2), nb)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (batches, weights, step_keys))
            return params, opt_state, jnp.mean(losses)

        # Run a *block* of epochs in one device call.  Bit-identical to
        # calling ``epoch_fn`` sequentially (same per-epoch keys), but the
        # host<->device round trip — ~20 ms through a tunneled TPU, and a
        # dispatch per epoch even locally — is paid once per validation
        # interval instead of once per epoch.
        def _epoch_block(params, opt_state, first_epoch, num_epochs, graph,
                         consts):
            def body(i, carry):
                params, opt_state, _ = carry
                return _epoch(params, opt_state, first_epoch + i, graph,
                              consts)
            return jax.lax.fori_loop(
                0, num_epochs, body, (params, opt_state, jnp.float32(0.0)))

        epoch_jit = jax.jit(_epoch, donate_argnums=(0, 1))
        block_jit = jax.jit(_epoch_block, static_argnums=(3,),
                            donate_argnums=(0, 1))

        # one optimizer step (loss -> grads -> Adam), jitted standalone with
        # NO donation: the roofline/profiling harness re-feeds the same
        # buffers to pair XLA's "bytes accessed" with measured wall time
        # (utils.roofline.measure).  Math identical to the scan body above.
        def _step1(params, opt_state, batch, y, w, key, graph, consts):
            loss, grads = jax.value_and_grad(_loss)(params, batch, y, w, key,
                                                    graph, consts)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step1_jit = jax.jit(_step1)
        self._step1 = _step1

        def _predict(params, batch, graph, consts):
            probs, _ = model.to_prob(
                params, graph, batch, train=False,
                **(dict(train_pos=consts["tp"],
                        train_pos_valid=consts["tpv"]) if is_pcgnn else {}))
            return probs

        predict_jit = jax.jit(_predict)

        consts = {
            "idx_train": self.idx_train_dev,
            "pick_weights": self.pick_weights,
            "tp": self.train_pos_dev,
            "tpv": self.train_pos_valid,
            # features[train_pos] is constant for the run (frozen features,
            # fixed split): hoisting the gather out of the step removes a
            # per-step [P]-row fetch
            "tpf": self.graph.features[self.train_pos_dev],
        }
        # trim the jit graph argument to what the model consumes: PC-GNN
        # never touches homo inside the step (pick weights are precomputed
        # from homo degrees at init), and SAGE/GCN never touch relations.
        # Aliasing homo to relations[0] shares buffers — no copy — and at
        # stress scale keeps the (multi-GB) homo CSR out of the step's
        # argument set.
        full = self.graph
        if is_spmd:
            graph = (x_sharded, rel_shards, full.labels,
                     fused if is_pcgnn else None)
            if is_pcgnn:
                self.predict_fn = lambda p, batch: spmd_predict(
                    p, x_sharded, rel_shards, jnp.asarray(batch, jnp.int32),
                    consts["tp"], consts["tpv"], fused)
            else:
                self.predict_fn = lambda p, batch: homo_predict(
                    p, x_sharded, rel_shards, jnp.asarray(batch, jnp.int32))
        elif is_pcgnn and full.num_relations:
            graph = dataclasses.replace(full, homo=full.relations[0])
        elif not is_pcgnn:
            graph = dataclasses.replace(full, relations=(), node_pack=None)
        else:
            graph = full
        if not is_spmd:
            self.predict_fn = lambda p, batch: predict_jit(p, batch, graph,
                                                           consts)
        self.epoch_fn = lambda p, o, e: epoch_jit(p, o, e, graph, consts)
        self.epoch_block_fn = lambda p, o, e0, n: block_jit(p, o, e0, n,
                                                            graph, consts)
        self._step_graph, self._step_consts = graph, consts

    def single_step(self, params, opt_state, batch, y, w, nscan: int = 1):
        """(jitted_fn, full_args) for the training step — the profiling /
        roofline entry point (pairs with ``utils.roofline.measure``).

        ``nscan`` > 1 wraps the step in a ``lax.scan`` of that many
        back-to-back iterations (params/opt state threaded through), so
        one dispatch measures N device-resident steps: through a tunneled
        runtime each dispatch costs ~0.3 ms of submit latency, which at
        nscan=1 would be attributed to the ~0.6 ms step itself.  Divide
        the measured wall time by ``nscan``.
        """
        if self.mesh is not None:
            raise NotImplementedError(
                "single_step is the single-chip roofline entry point; under "
                "SPMD (num_devices > 1) the loss expects shard_batch-laid-"
                "out inputs — profile via parallel.spmd.make_spmd_train_step "
                "(see benchmarks/spmd_scaling.py) instead")
        key = jax.random.key(0)
        args = (params, opt_state, jnp.asarray(batch, jnp.int32),
                jnp.asarray(y, jnp.int32), jnp.asarray(w, jnp.float32), key,
                self._step_graph, self._step_consts)
        if nscan == 1:
            return self._step1_jit, args
        step1 = self._step1

        @jax.jit
        def stepn(params, opt_state, batch, y, w, key, graph, consts):
            def body(carry, i):
                p, o = carry
                # rotate the batch per iteration: with an identical batch
                # XLA hoists every batch-dependent gather (record fetch,
                # node_pack row) out of the scan, undercounting the step
                p, o, loss = step1(p, o, jnp.roll(batch, i),
                                   jnp.roll(y, i), jnp.roll(w, i), key,
                                   graph, consts)
                return (p, o), loss
            (p, o), losses = jax.lax.scan(
                body, (params, opt_state),
                jnp.arange(nscan, dtype=jnp.int32))
            return p, o, losses[-1]

        return stepn, args

    # ------------------------------------------------------------------ #

    def _resume_path(self) -> str:
        cfg = self.config
        tag = (f"resume-{cfg['model']}-{cfg['data_name'].replace(':', '_')}"
               f"-seed{cfg['seed']}-tr{cfg['train_ratio']}")
        import os
        return os.path.join(self.result.dirs["models"], f"{tag}.ckpt")

    def train(self):
        cfg = self.config
        if getattr(self.model, "learn_features", False):
            # trainable node table, initialized from the dataset features
            # (the reference's nn.Embedding init, model_handler.py:85)
            params = self.model.init(jax.random.key(cfg["seed"]),
                                     features=self.graph.features)
        else:
            params = self.model.init(jax.random.key(cfg["seed"]))
        opt_state = self.tx.init(params)
        auc_best, f1_mac_best, epoch_best = 1e-10, 1e-10, 0
        start_epoch = 0
        # "f1" = the reference's (f1) selection protocol: validation F1 is
        # the 100-threshold sweep's best, the gain rule runs on the swept
        # F1-macro, and the winning threshold transfers to the final test
        # (model_handler(f1).py:142-178, utils(f1).py:314-322)
        select_f1 = cfg.get("select", "gain") == "f1"
        thresh_best = None

        # mid-training resume (params + optimizer state + selection state);
        # the reference can only restore best-val params (model_handler:175)
        if cfg.get("resume"):
            try:
                st = load_checkpoint(self._resume_path())
                params = jax.tree.map(jnp.asarray, st["params"])
                opt_state = jax.tree.map(jnp.asarray, st["opt_state"])
                auc_best, f1_mac_best = st["auc_best"], st["f1_mac_best"]
                epoch_best, start_epoch = st["epoch_best"], st["epoch"] + 1
                thresh_best = st.get("thresh_best")
                print(f"Resumed from epoch {st['epoch']}")
            except FileNotFoundError:
                pass

        profile_dir = cfg.get("profile_dir")
        # multi-host: every process runs the identical control flow (the
        # replicated metrics guarantee identical gain/patience decisions),
        # but only process 0 touches the result tree / checkpoints — the
        # others keep best params in memory
        is_main = (not self.distributed) or jax.process_index() == 0
        best_params = params
        epoch_times = []
        valid_every = cfg["valid_epochs"]
        epoch = start_epoch - 1
        next_epoch = start_epoch
        while next_epoch < cfg["epochs"]:
            # run epochs up to the next validation / patience / end boundary
            # in ONE device call (bit-identical to per-epoch calls; see
            # _epoch_block).  Profiling keeps per-epoch calls so the trace
            # brackets whole dispatches.
            n = valid_every - (next_epoch % valid_every)
            n = min(n, cfg["epochs"] - next_epoch,
                    max(epoch_best + cfg["patience"] + 1 - next_epoch, 1))
            if profile_dir:
                n = 1
                if next_epoch == start_epoch + 2:
                    jax.profiler.start_trace(profile_dir)
            t0 = time.time()
            params, opt_state, loss = self.epoch_block_fn(
                params, opt_state, next_epoch, n)
            jax.block_until_ready(loss)
            dt = time.time() - t0
            epoch_times.extend([dt / n] * n)
            epoch = next_epoch + n - 1
            next_epoch = epoch + 1
            if profile_dir and epoch >= start_epoch + 4:
                jax.profiler.stop_trace()
                profile_dir = None

            if (epoch + 1) % cfg["valid_epochs"] == 0:
                print(f"Valid at epoch {epoch} (loss {float(loss):.4f}, "
                      f"epoch_time {epoch_times[-1]*1e3:.1f}ms)")
                res = evaluate(
                    lambda nodes: self.predict_fn(params, nodes),
                    self.idx_valid, self.y_valid, self.batch_size,
                    result=self.result if is_main else None, epoch=epoch,
                    epoch_best=epoch_best, flag="val",
                    sweep_thresh=select_f1)
                gain_auc = (res.auc - auc_best) / auc_best
                gain_f1 = (res.f1_macro - f1_mac_best) / f1_mac_best
                if gain_auc + gain_f1 > 0:
                    auc_best, f1_mac_best, epoch_best = res.auc, res.f1_macro, epoch
                    thresh_best = res.thresh
                    best_params = jax.tree.map(lambda x: x.copy(), params)
                    if is_main:
                        save_checkpoint(self.result.model_path, best_params)
                if cfg.get("resume") and is_main:
                    save_checkpoint(self._resume_path(), dict(
                        params=params, opt_state=opt_state, epoch=epoch,
                        auc_best=auc_best, f1_mac_best=f1_mac_best,
                        epoch_best=epoch_best, thresh_best=thresh_best))
            if (epoch - epoch_best) > cfg["patience"]:
                print(f"Early stopping at epoch {epoch}")
                break

        print(f"Restore model from epoch {epoch_best}")
        if is_main:
            # non-main processes keep the in-memory best params (identical
            # values — the gain rule ran on replicated metrics) instead of
            # racing process 0's checkpoint file
            try:
                best_params = jax.tree.map(
                    jnp.asarray, load_checkpoint(self.result.model_path))
            except FileNotFoundError:
                pass  # no validation improvement was ever recorded
        res = evaluate(
            lambda nodes: self.predict_fn(best_params, nodes),
            self.idx_test, self.y_test, self.batch_size,
            result=self.result if is_main else None, epoch_best=epoch_best,
            flag="test", valid_thresh=thresh_best if select_f1 else None)
        if is_main:
            self.result.save_predictions(res.anomaly_confidence,
                                         "anomaly_confidence")
        self.best_params = best_params
        self.epoch_times = epoch_times
        self.valid_thresh = thresh_best
        return res.auc, res.recall, res.f1_macro
