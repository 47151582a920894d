"""Multi-host (DCN) data-parallel smoke test.

Spawns 2 coordinator-connected processes (2 virtual CPU devices each) and
runs one real stage-1 train step over the resulting 4-device global mesh —
the TPU-native replacement for multi-node training the reference lacks
(SURVEY §2.3). Verifies both processes compute the same finite loss.
"""

import os
import re
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
  with socket.socket() as s:
    s.bind(("127.0.0.1", 0))
    return s.getsockname()[1]


def _run_workers():
  port = _free_port()
  coordinator = f"127.0.0.1:{port}"
  worker = os.path.join(HERE, "multihost_worker.py")
  env = dict(os.environ)
  env["PYTHONPATH"] = os.pathsep.join(
      [os.path.dirname(HERE)] + env.get("PYTHONPATH", "").split(os.pathsep))
  procs = [
      subprocess.Popen([sys.executable, worker, coordinator, "2", str(pid)],
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, env=env)
      for pid in range(2)
  ]
  outs = []
  for p in procs:
    # generous: the two workers compile a full train step each and share the
    # machine with the rest of the suite (observed >10 min under full load)
    out, _ = p.communicate(timeout=1800)
    outs.append(out)
  return procs, outs


# signatures of the one failure mode worth retrying: the DCN coordinator
# handshake timing out because the host is saturated. Anything else (a real
# coordination/train regression) must fail loudly on the first attempt.
_HANDSHAKE_FAILURES = (
    "Deadline", "DEADLINE_EXCEEDED", "UNAVAILABLE",
    "failed to connect to coordination service",
    "Coordination service", "barrier timed out",
)


def test_two_process_train_step():
  # this test is scheduled FIRST in the suite (tests/conftest.py ordering
  # hook) so its two workers don't share the host with 90 other tests; the
  # retry below is therefore narrow — handshake-timeout signatures only —
  # and always prints the first attempt's output
  procs, outs = _run_workers()
  if (any(p.returncode != 0 for p in procs)
      and any(sig in out for out in outs for sig in _HANDSHAKE_FAILURES)):
    print("multihost handshake-timeout retry; first attempt output:")
    for out in outs:
      print(out)
    procs, outs = _run_workers()
  for p, out in zip(procs, outs):
    assert p.returncode == 0, f"worker failed:\n{out}"

  losses = {}
  for out in outs:
    m = re.search(r"MULTIHOST_LOSS (\d) (\S+)", out)
    assert m, out
    losses[int(m.group(1))] = float(m.group(2))
  assert set(losses) == {0, 1}
  l0, l1 = losses[0], losses[1]
  assert l0 == l1, (l0, l1)          # globally consistent
  assert abs(l0) < 1e6 and l0 == l0  # finite
