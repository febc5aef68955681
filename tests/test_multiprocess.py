"""True multi-host execution: 2 processes x 4 devices via
jax.distributed + gloo, running the fused pipeline slice, asserted
bit-equal to the single-process 8-shard run.

This is the multi-host proof demanded by BASELINE.json's north star
(>=80% scaling measured at 1 chip / 1 host / >=2 hosts): the same
shard_map program, the same gap-home routing, executed across process
boundaries with real cross-process collectives.
"""

import json
import os
import socket
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "mp_slice_worker.py")


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_slice_bit_equal(tmp_path):
    out_path = tmp_path / "mp_result.json"
    port = free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", "4", str(port),
             str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
    with open(out_path) as f:
        mp = json.load(f)

    # single-process baseline on the same scenario (8 shards x 1 gap)
    from test_slice import run_slice
    sp = run_slice(8, 1)

    assert mp["counts"] == sp["counts"]
    assert mp["hist"] == sp["hist"]
    assert mp["total_recv"] == sp["total_recv"]
    for g, want in sp["per_gap"].items():
        got = mp["per_gap"][str(g)]
        assert got["n_reads"] == want["n_reads"]
        assert got["contigs"] == want["contigs"]
        assert tuple(got["score"]) == want["score"]
