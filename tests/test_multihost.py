"""2-process multi-host integration test (VERDICT round-2 item 3).

Launches TWO actual processes that rendezvous through
``jax.distributed.initialize`` (localhost coordinator, CPU backend, 4 virtual
devices each — 8 global), train the SchemaNet predictor through the full
``Trainer`` on per-process loader shards, validate, and checkpoint
collectively. A third, single-process launch with 8 local devices runs the
SAME global program; the assertions close the last distributed-correctness
hole: every ``jax.process_count() > 1`` branch (loader process shards,
``put_local_batch`` global-array assembly, validate reduction, rank-0 +
collective Orbax checkpointing) executes and must agree with single-process.

Reference anchor: ``dist_engine.py:106-146`` (TCP rendezvous + mp.spawn join).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(pid: int, nproc: int, port: int, outdir: str) -> subprocess.Popen:
    env = dict(os.environ)
    # the worker sets XLA_FLAGS/JAX_PLATFORMS itself before importing jax;
    # drop the parent's 8-device flag so it can't leak through
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, "-m", "tests._multihost_worker",
         str(pid), str(nproc), str(port), outdir],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _wait(procs, timeout=900):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return outs


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    base = tmp_path_factory.mktemp("multihost")
    two = str(base / "2p")
    one = str(base / "1p")
    os.makedirs(two), os.makedirs(one)

    port = _free_port()
    procs = [_launch(0, 2, port, two), _launch(1, 2, port, two)]
    _wait(procs)

    _wait([_launch(0, 1, 0, one)])

    def load(path):
        with open(path) as f:
            return json.load(f)

    return {
        "r2": [load(os.path.join(two, f"result_2p_{i}.json")) for i in (0, 1)],
        "r1": load(os.path.join(one, "result_1p_0.json")),
        "two_dir": two,
        "one_dir": one,
    }


def test_processes_agree(runs):
    """Both processes of the 2-proc run observe identical global metrics
    (fully-replicated jit outputs: one SPMD program, one answer)."""
    a, b = runs["r2"]
    assert a["steps"] == b["steps"] == 8
    assert a["val_loss"] == b["val_loss"]
    assert a["val_acc1"] == b["val_acc1"]
    assert a["val_loss_dict"] == b["val_loss_dict"]
    np.testing.assert_allclose(a["param_digest"], b["param_digest"], rtol=1e-12)


def test_multiprocess_matches_single_process(runs):
    """2 processes x 4 devices == 1 process x 8 devices: same global batches
    (loader shards are process-count-invariant by global position), same SPMD
    program, same mesh — training and validation must agree numerically."""
    a = runs["r2"][0]
    s = runs["r1"]
    assert a["steps"] == s["steps"]
    np.testing.assert_allclose(a["val_loss"], s["val_loss"], rtol=2e-5, atol=1e-7)
    assert a["val_acc1"] == s["val_acc1"]
    for k in s["val_loss_dict"]:
        np.testing.assert_allclose(
            a["val_loss_dict"][k], s["val_loss_dict"][k], rtol=2e-5, atol=1e-7,
            err_msg=k,
        )
    np.testing.assert_allclose(a["param_digest"], s["param_digest"], rtol=1e-6)


def test_checkpoint_written_once_and_restorable(runs):
    """The collective save writes ONE checkpoint tree (rank-0 bookkeeping,
    every process participating) that a fresh single-process context can
    restore."""
    ckpt_dir = os.path.join(runs["two_dir"], "ckpt")
    names = sorted(os.listdir(ckpt_dir))
    assert "best" in names and "meta.json" in names
    iters = [n for n in names if n.startswith("iter-")]
    assert iters == ["iter-8"], names
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["last_tag"] == "iter-8"

    from schemanet_tpu.train.common import CheckpointManager

    restored = CheckpointManager(ckpt_dir).restore("best")
    assert "params" in restored and "opt_state" in restored
    # restored params match the digest both processes reported
    digest = sum(
        float(np.abs(np.asarray(leaf, np.float64)).sum())
        for leaf in jax.tree_util.tree_leaves(restored["params"])
    )
    np.testing.assert_allclose(digest, runs["r2"][0]["param_digest"], rtol=1e-6)
