"""Command-line interface: job submission + daemon lifecycle (F15/F16).

Mirrors the reference's two operational surfaces:

- ``mapreduce-submit`` (reference: mapreduce/submit.py:23-96) becomes
  ``mapreduce-spark submit`` with the same option names and defaults
  (4 mappers, 1 reducer, wc executables). Default mode runs the job
  synchronously in-process and prints the output files — strictly
  more informative than the reference's "poll the output directory".
  With ``--remote``, submit is the reference's exact fire-and-forget:
  a ``new_manager_job`` JSON message over TCP to the daemon.
- ``bin/mapreduce start|stop|status|restart`` (reference:
  bin/mapreduce:36-94) managed manager/worker daemons; here the same
  verbs manage the engine daemon (``daemon.py``) — a warm SparkSession
  behind the reference's TCP message protocol. ``stop`` sends the
  ``shutdown`` JSON message first (exactly bin/mapreduce:22's netcat
  line), then escalates to SIGTERM/SIGKILL like the reference's
  pkill fallback (bin/mapreduce:26-33).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

from . import daemon as daemonmod


def _abs_executable(executable: str | list) -> str | list:
    """Resolve an executable spec's program path against the caller's
    cwd (arguments untouched) — same reasoning as the input/output
    dirs: the daemon's cwd is unrelated and fire-and-forget hides a
    misresolution. Bare command names that resolve via PATH (``sort``,
    ``cat``) are left alone: abspath would turn them into nonexistent
    cwd-relative paths that only fail server-side."""
    import shlex
    import shutil

    if isinstance(executable, (list, tuple)):
        parts = list(executable)
    else:
        parts = shlex.split(str(executable))
    if parts:
        prog = str(parts[0])
        if os.sep in prog or os.path.exists(prog):
            parts[0] = os.path.abspath(prog)
        elif shutil.which(prog) is None:
            # Neither a cwd-relative path nor on PATH: fail fast here
            # rather than letting the daemon log a FileNotFoundError
            # the fire-and-forget client never sees.
            raise FileNotFoundError(f"executable not found: {prog!r}")
    return parts


def _cmd_submit(args: argparse.Namespace) -> int:
    if args.remote:
        # Reference fire-and-forget semantics (submit.py:68-91).
        # Paths resolve against the CALLER's cwd before shipping —
        # the daemon's cwd is unrelated, and fire-and-forget means a
        # silently misresolved relative path would never surface.
        # Without the daemon's auth token the job would be silently
        # dropped server-side, so fail fast here instead.
        info = daemonmod.read_pidfile(args.pidfile)
        if not info or not info.get("auth"):
            print(
                f"Failed to send job to manager: no running daemon found via "
                f"pidfile {args.pidfile} (needed for the auth token).",
                file=sys.stderr,
            )
            return 1
        port = info["port"]
        if args.port != daemonmod.DEFAULT_PORT and args.port != port:
            # An EXPLICIT --port wins over the pidfile (reference
            # submit.py sends to the port the user gave — e.g. a second
            # daemon or the reference manager itself); silently
            # redirecting to the pidfile's port would run the job on
            # the wrong engine with exit 0.
            port = args.port
        try:
            mapper = _abs_executable(args.mapper_executable)
            reducer = _abs_executable(args.reducer_executable)
        except FileNotFoundError as e:
            print(f"Failed to send job to manager: {e}", file=sys.stderr)
            return 1
        ok = daemonmod.send_message(
            port,
            {
                "message_type": "new_manager_job",
                "input_directory": os.path.abspath(args.input_directory),
                "output_directory": os.path.abspath(args.output_directory),
                "mapper_executable": mapper,
                "reducer_executable": reducer,
                "num_mappers": args.num_mappers,
                "num_reducers": args.num_reducers,
                "compat": not args.no_compat,
                "auth": info["auth"],
            },
        )
        if not ok:
            print("Failed to send job to manager.", file=sys.stderr)
            return 1
        print(f"Submitted job to manager 127.0.0.1:{port}")
    else:
        from .operators.mapreduce import run_job
        from .session import get_spark

        spark = get_spark(app_name="mapreduce-submit")
        print(f"Submitted job to Spark {spark.version} ({spark.sparkContext.master})")
    print("input directory     ", args.input_directory)
    print("output directory    ", args.output_directory)
    print("mapper executable   ", args.mapper_executable)
    print("reducer executable  ", args.reducer_executable)
    print("num mappers         ", args.num_mappers)
    print("num reducers        ", args.num_reducers)
    if args.remote:
        return 0
    outputs = run_job(
        spark,
        args.input_directory,
        args.output_directory,
        args.mapper_executable,
        args.reducer_executable,
        args.num_mappers,
        args.num_reducers,
        compat=not args.no_compat,
    )
    for o in outputs:
        print(o)
    return 0


def _cmd_status(args: argparse.Namespace) -> int:
    info = daemonmod.read_pidfile(args.pidfile)
    if info:
        print(f"manager running (pid={info['pid']} port={info['port']})")
    else:
        print("manager not running")
    return 0


def _cmd_start(args: argparse.Namespace) -> int:
    if daemonmod.read_pidfile(args.pidfile):
        # Reference: "Error: mapreduce-manager is already running".
        print("Error: mapreduce-spark daemon is already running", file=sys.stderr)
        return 1
    print("starting mapreduce ...")
    log = Path(args.pidfile).with_suffix(".log")
    with open(log, "ab") as logf:
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "mapreduce_server_development_spark.cli",
                "_daemon",
                "--port",
                str(args.port),
                "--pidfile",
                args.pidfile,
                *(["--warmup"] if args.warmup else []),
            ],
            stdin=subprocess.DEVNULL,
            stdout=logf,
            stderr=logf,
            start_new_session=True,  # survives the CLI process exiting
            cwd=os.getcwd(),
        )
    # The daemon writes the pidfile only once its socket is listening.
    deadline = time.time() + args.timeout
    while time.time() < deadline:
        if daemonmod.read_pidfile(args.pidfile):
            print(f"daemon ready (log: {log})")
            return 0
        time.sleep(0.2)
    print(f"Error: daemon did not come up within {args.timeout}s "
          f"(see {log})", file=sys.stderr)
    return 1


def _cmd_stop(args: argparse.Namespace) -> int:
    print("stopping mapreduce ...")
    info = daemonmod.read_pidfile(args.pidfile)
    if not info:
        return 0
    pid, port = int(info["pid"]), int(info["port"])

    def _wait_dead(seconds: float) -> bool:
        deadline = time.time() + seconds
        while time.time() < deadline:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                # Process gone. A pidfile left behind (SIGKILL skips the
                # daemon's cleanup) is removed here so a recycled pid can
                # never be mistaken for the daemon later.
                Path(args.pidfile).unlink(missing_ok=True)
                return True
            except PermissionError:
                # Pid recycled to another user's process mid-wait: the
                # daemon is dead (same EPERM-means-not-ours rule as
                # read_pidfile).
                Path(args.pidfile).unlink(missing_ok=True)
                return True
            time.sleep(0.2)
        return False

    # Cooperative first (the reference's netcat shutdown message), then
    # the pkill escalation path (bin/mapreduce:26-44). Each signal gets
    # its own wait — including the last one, so a SIGKILL that lands is
    # never misreported as failure.
    daemonmod.send_message(
        port, {"message_type": "shutdown", "auth": info.get("auth")}
    )
    for sig in (signal.SIGTERM, signal.SIGKILL, None):
        if _wait_dead(args.timeout / 3):
            return 0
        if sig is not None:
            try:
                os.kill(pid, sig)
            except ProcessLookupError:
                Path(args.pidfile).unlink(missing_ok=True)
                return 0
    print("Error: daemon did not stop", file=sys.stderr)
    return 1


def _cmd_restart(args: argparse.Namespace) -> int:
    rc = _cmd_stop(args)
    return rc if rc else _cmd_start(args)


def _cmd_daemon(args: argparse.Namespace) -> int:
    return daemonmod.serve(
        port=args.port, pidfile=args.pidfile, warmup=args.warmup
    )


def _add_daemon_opts(p: argparse.ArgumentParser) -> None:
    p.add_argument("--port", type=int, default=daemonmod.DEFAULT_PORT,
                   help="daemon TCP port (reference manager default 6000)")
    p.add_argument("--pidfile", default=daemonmod.DEFAULT_PIDFILE)
    p.add_argument("--timeout", type=float, default=60.0,
                   help="seconds to wait for start/stop")
    p.add_argument("--warmup", action="store_true",
                   help="pre-JIT the engine's hot expression chains at "
                        "daemon startup (session.warmup_expressions), so "
                        "the first job skips the fresh-JVM interpreted "
                        "path; a few seconds once per session")


def main(argv: list[str] | None = None) -> int:
    """Top-level CLI dispatch."""
    parser = argparse.ArgumentParser(prog="mapreduce-spark")
    sub = parser.add_subparsers(dest="verb", required=True)

    p = sub.add_parser("submit", help="run a MapReduce job")
    p.add_argument("-i", "--input", dest="input_directory",
                   default="tests/testdata/input")
    p.add_argument("-o", "--output", dest="output_directory", default="output")
    p.add_argument("-m", "--mapper", dest="mapper_executable",
                   default="tests/testdata/exec/wc_map.sh")
    p.add_argument("-r", "--reducer", dest="reducer_executable",
                   default="tests/testdata/exec/wc_reduce.sh")
    p.add_argument("--nmappers", dest="num_mappers", type=int, default=4)
    p.add_argument("--nreducers", dest="num_reducers", type=int, default=1)
    p.add_argument("--no-compat", action="store_true",
                   help="hash grouping (one shuffle) instead of byte-exact "
                        "distinct-line round-robin")
    p.add_argument("--remote", action="store_true",
                   help="fire-and-forget to the running daemon (reference "
                        "submit semantics) instead of running in-process")
    _add_daemon_opts(p)
    p.set_defaults(func=_cmd_submit)

    p = sub.add_parser("status", help="print daemon status")
    _add_daemon_opts(p)
    p.set_defaults(func=_cmd_status)

    p = sub.add_parser("start", help="start the engine daemon")
    _add_daemon_opts(p)
    p.set_defaults(func=_cmd_start)

    p = sub.add_parser("stop", help="stop the engine daemon")
    _add_daemon_opts(p)
    p.set_defaults(func=_cmd_stop)

    p = sub.add_parser("restart", help="restart the engine daemon")
    _add_daemon_opts(p)
    p.set_defaults(func=_cmd_restart)

    p = sub.add_parser("_daemon", help=argparse.SUPPRESS)
    _add_daemon_opts(p)
    p.set_defaults(func=_cmd_daemon)

    args = parser.parse_args(argv)
    return args.func(args)


# -- reference console-script parity (setup.py:24-29) -----------------------
# The reference installs mapreduce-manager / mapreduce-worker /
# mapreduce-submit; these aliases map each onto the engine's verbs so
# existing ops scripts keep working after `pip install` of this package.


def manager_main(argv: list[str] | None = None) -> int:
    """``mapreduce-manager``: run the manager process in the foreground
    (reference manager/__main__.py) — here, the warm-session daemon."""
    return main(["_daemon", *(sys.argv[1:] if argv is None else argv)])


def worker_main(argv: list[str] | None = None) -> int:
    """``mapreduce-worker``: the reference launches a separate worker
    process per host; Spark's executor pool plays that role (worker
    registration/heartbeat/re-execution are F10-F13, subsumed by the
    scheduler), so there is no per-host process to start. The alias
    performs the operational check a worker launcher would gate on —
    daemon liveness — and exits 0 only when the data plane is up
    (the ``status`` verb itself keeps the reference's always-0 exit,
    bin/mapreduce:63-74)."""
    argv = sys.argv[1:] if argv is None else argv
    rc = main(["status", *argv])
    if rc:
        return rc
    probe = argparse.ArgumentParser()
    _add_daemon_opts(probe)
    known, _ = probe.parse_known_args(argv)
    return 0 if daemonmod.read_pidfile(known.pidfile) else 1


def submit_main(argv: list[str] | None = None) -> int:
    """``mapreduce-submit``: fire-and-forget a job message to the
    running manager daemon (reference submit.py semantics)."""
    return main(["submit", "--remote", *(sys.argv[1:] if argv is None else argv)])


if __name__ == "__main__":
    sys.exit(main())
