#!/usr/bin/env python
"""Training supervisor: stall detection + automatic checkpoint-resume.

Failure recovery beyond the reference's manual checkpoint-restart
(SURVEY.md §5 "Failure detection ... none"): the remote-TPU tunnel can hang
indefinitely (observed: a training step blocked >25 min with the connection
thread in ``wait_woken`` while the device stayed healthy). The supervisor
watches the training log for progress; when no step is logged for
``--stall-timeout`` seconds it kills the trainer and relaunches it with
``--resume`` from the latest checkpoint, up to ``--max-restarts`` times.

Usage:
  python scripts/train_supervisor.py -opt configs/train_synthetic.yml \
      [--stall-timeout 600] [--max-restarts 10] [--adopt-pid PID] [...]

Extra args after ``--`` are forwarded to scripts/train.py.
"""

import argparse
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _log_mtime(path):
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def _alive(pid):
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    # A finished-but-unreaped child (zombie) still answers kill(pid, 0);
    # without this check the supervisor waits out the full stall timeout
    # after a clean "done at step" exit (observed live at step 10500).
    try:
        os.waitpid(pid, os.WNOHANG)  # reap if it is our child
    except OSError:
        pass
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().split()[2] != "Z"
    except OSError:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--stall-timeout", type=float, default=600.0)
    ap.add_argument("--poll", type=float, default=30.0)
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--adopt-pid", type=int, default=None,
                    help="supervise an already-running trainer first")
    ap.add_argument("rest", nargs="*",
                    help="extra args forwarded to train.py (after --)")
    args = ap.parse_args()

    from stif_tpu.utils.config import parse_options

    opt = parse_options(args.opt, is_train=True)
    models_dir = (opt.get("path") or {}).get("models") or "."
    log_path = os.path.join(models_dir, "train.log")
    out_path = os.path.join(models_dir, "train_stdout.log")

    train_cmd = [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "train.py"),
                 "-opt", args.opt] + list(args.rest)

    def launch(resume: bool) -> int:
        cmd = train_cmd + (["--resume"] if resume else [])
        # train.py creates models_dir itself, but the supervisor opens the
        # stdout log first — on a fresh VM (runs/ wiped) that crashed the
        # launch before the trainer ever started.
        os.makedirs(models_dir, exist_ok=True)
        with open(out_path, "ab") as out:
            p = subprocess.Popen(cmd, stdout=out, stderr=subprocess.STDOUT)
        print(f"[supervisor] launched pid {p.pid} (resume={resume})",
              flush=True)
        return p.pid

    pid = args.adopt_pid if (args.adopt_pid and _alive(args.adopt_pid)) \
        else launch(resume=args.adopt_pid is not None)
    restarts = 0
    # Stall clock starts NOW: a stale train.log from an earlier run must not
    # count as "no progress" against a freshly launched trainer (observed
    # live: a 5h-old log mtime got a still-compiling trainer killed at the
    # supervisor's first poll).
    last = time.time()

    while True:
        time.sleep(args.poll)
        m = _log_mtime(log_path)
        if m > last:
            last = m
        stalled = (time.time() - last) > args.stall_timeout
        dead = not _alive(pid)
        if dead:
            # finished or crashed: if the log's final line says done, exit
            try:
                tail = open(log_path).readlines()[-1]
            except Exception:
                tail = ""
            if "done at step" in tail:
                print("[supervisor] training finished", flush=True)
                return
            print("[supervisor] trainer died; resuming", flush=True)
        elif stalled:
            print(f"[supervisor] no progress for "
                  f"{time.time() - last:.0f}s; killing {pid}", flush=True)
            try:
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
            time.sleep(5)
        else:
            continue
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] max restarts exceeded", flush=True)
            return
        pid = launch(resume=True)
        last = time.time()


if __name__ == "__main__":
    main()
