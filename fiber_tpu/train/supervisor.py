"""Elastic training supervisor: restart-on-failure with checkpoint resume.

The reference relies on AzureML/MPI to re-launch dead training jobs and
on the Checkpointer's `has_checkpoint` auto-resume
(fine_grained utils/checkpoint.py:59-112).  TPU-native equivalent: a
host-side supervisor that runs the training command as a subprocess,
restarts it on abnormal exit with exponential backoff, and relies on the
trainers' latest-step orbax auto-resume (train/checkpoint.py) so a
restart continues from the last saved step.  Pod-scale note: run one
supervisor per host; `jax.distributed.initialize` (parallel/multihost.py)
re-forms the global mesh when all hosts are back.
"""

from __future__ import annotations

import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence


@dataclass
class SuperviseResult:
    attempts: int
    returncode: int
    history: List[int] = field(default_factory=list)


def supervise(cmd: Sequence[str], max_restarts: int = 10,
              backoff_s: float = 5.0, backoff_factor: float = 2.0,
              max_backoff_s: float = 300.0,
              good_exit_codes: Sequence[int] = (0,),
              run: Optional[Callable[[Sequence[str]], int]] = None,
              sleep: Callable[[float], None] = time.sleep,
              log: Callable[[str], None] = lambda m: print(
                  m, file=sys.stderr)) -> SuperviseResult:
    """Run `cmd`, restarting on failure.

    Returns once the command exits with a code in `good_exit_codes` or
    `max_restarts` consecutive failures occur.  `run`/`sleep` are
    injectable for tests; the default `run` is a blocking subprocess.
    """
    if run is None:
        def run(c):
            return subprocess.call(list(c))

    history: List[int] = []
    delay = backoff_s
    for attempt in range(max_restarts + 1):
        rc = run(cmd)
        history.append(rc)
        if rc in good_exit_codes:
            return SuperviseResult(attempts=attempt + 1, returncode=rc,
                                   history=history)
        if attempt == max_restarts:
            break
        log(f"[supervisor] attempt {attempt + 1} exited rc={rc}; "
            f"restarting in {delay:.0f}s (resume from latest checkpoint)")
        sleep(delay)
        delay = min(delay * backoff_factor, max_backoff_s)
    log(f"[supervisor] giving up after {len(history)} attempts")
    return SuperviseResult(attempts=len(history), returncode=history[-1],
                           history=history)


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse
    p = argparse.ArgumentParser(
        description="Supervise a training command with auto-restart; the "
                    "wrapped trainer resumes from its latest checkpoint.")
    p.add_argument("--max-restarts", type=int, default=10)
    p.add_argument("--backoff", type=float, default=5.0)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to run (prefix with --)")
    args = p.parse_args(argv)
    cmd = list(args.cmd)
    if cmd and cmd[0] == "--":  # drop only the leading separator: a
        cmd = cmd[1:]           # literal "--" inside the wrapped command
    if not cmd:                 # must pass through untouched
        p.error("no command given")
    res = supervise(cmd, max_restarts=args.max_restarts,
                    backoff_s=args.backoff)
    return res.returncode


if __name__ == "__main__":
    raise SystemExit(main())
