"""Long-lived engine daemon: TCP job listener over a warm SparkSession.

Operational parity with the reference's manager process
(mapreduce/manager/__main__.py):

- message plane: JSON messages on a localhost TCP socket, one message
  per connection, read to EOF — the reference's ``_handle_message``
  dispatch (manager/__main__.py:368-373). Two message types are
  honored: ``new_manager_job`` (enqueue a job, fields as in
  mapreduce/submit.py:68-76) and ``shutdown`` (drain and exit — the
  reference's ``bin/mapreduce stop`` message, bin/mapreduce:22). One
  deliberate deviation: every message must carry the per-run ``auth``
  token from the owner-only pidfile — a tokenless localhost port
  would let any local user run executables as the daemon's owner.
- F9 FIFO queue: jobs run strictly one at a time in submission order
  on a single worker thread (the reference manager also runs one job
  at a time off its queue).
- F14 cooperative shutdown: ``shutdown`` finishes nothing mid-flight —
  the worker drains the queue sentinel, then ``spark.stop()`` is
  called before the process exits. SIGTERM is handled the same way.
- keeping the SparkSession (JVM, executor pool, codegen cache) warm
  across jobs is the actual point: repeat submissions skip the ~10 s
  JVM spin-up the synchronous CLI pays per invocation.

The pidfile is JSON ``{"pid": ..., "port": ...}`` so the CLI can find
both the process and the socket; it is written only after the socket
is listening, so ``start`` can poll it to mean "ready".
"""

from __future__ import annotations

import hmac
import json
import os
import queue
import secrets
import signal
import socket
import stat as statmod
import sys
import threading
from pathlib import Path

#: Default rendezvous (reference manager default port, submit.py:25).
DEFAULT_PORT = 6000


def _runtime_dir() -> str:
    """Directory for the pidfile: XDG_RUNTIME_DIR when available (a
    kernel-guaranteed 0700 per-user tmpfs), else a 0700 per-user
    subdirectory of TMPDIR — never a bare world-writable /tmp path,
    where a planted symlink at the predictable name could redirect the
    daemon's pidfile write (and the auth token) to an arbitrary file."""
    xdg = os.environ.get("XDG_RUNTIME_DIR")
    if xdg and os.path.isdir(xdg):
        return xdg
    d = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"mapreduce-spark-{os.getuid()}"
    )
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.lstat(d)  # lstat: a planted symlink must not pass as our dir
    if not statmod.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
        raise RuntimeError(f"refusing unsafe runtime dir {d!r}")
    os.chmod(d, 0o700)  # pre-existing dir: enforce, don't trust
    return d


DEFAULT_PIDFILE = os.path.join(_runtime_dir(), "mapreduce-spark.pid")

_RECV_LIMIT = 1 << 20  # 1 MiB: job specs are tiny; bound hostile input


def _looks_like_daemon(pid: int) -> bool:
    """Process-identity probe: is ``pid`` actually this daemon?

    ``os.kill(pid, 0)`` alone says only "some process has this pid" — a
    SIGKILL'd daemon leaves the pidfile behind, and the recycled pid
    may belong to an unrelated same-uid process, making ``status``
    report running and ``start`` refuse to launch. On Linux,
    /proc/<pid>/cmdline disambiguates; where /proc is unavailable the
    probe stays permissive (pid-alive only), matching the prior
    behavior rather than misreporting a live daemon as dead.
    """
    try:
        cmdline = Path(f"/proc/{pid}/cmdline").read_bytes()
    except OSError:
        return True  # no /proc: cannot disambiguate; trust pid-alive
    # The daemon is always a python interpreter running this package
    # (cli.py launches `python -m mapreduce_server_development_spark
    # _daemon ...`) or one of its console scripts. Match those
    # precisely — a bare "mapreduce" substring would also match an
    # innocent `vim mapreduce.py` on a recycled pid, which _cmd_stop
    # would then SIGKILL.
    args = cmdline.split(b"\0")
    scripts = {
        b"mapreduce-spark",
        b"mapreduce-manager",
        b"mapreduce-worker",
        b"mapreduce-submit",
    }
    if any(b"mapreduce_server_development_spark" in a for a in args):
        return True
    return bool(args) and os.path.basename(args[0]) in scripts


def read_pidfile(pidfile: str) -> dict | None:
    """Parse the pidfile; None if absent/corrupt or the pid is dead.

    Corrupt means ANY malformed content — non-JSON, JSON that is not an
    object, or missing/non-integer pid/port (a torn write or an
    unrelated tool's file must never crash a CLI verb).
    """
    try:
        info = json.loads(Path(pidfile).read_text())
        pid = int(info["pid"])
        int(info["port"])
    except (OSError, ValueError, KeyError, TypeError):
        return None
    try:
        os.kill(pid, 0)  # liveness probe
    except (ProcessLookupError, PermissionError):
        return None
    if not _looks_like_daemon(pid):
        return None
    return info


def send_message(port: int, message: dict, timeout: float = 5.0) -> bool:
    """Fire one JSON message at the daemon (reference submit.py:79-86:
    connect, sendall, close — no reply channel)."""
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=timeout) as sock:
            sock.sendall(json.dumps(message).encode("utf-8"))
        return True
    except OSError:
        return False


def _recv_json(conn: socket.socket) -> dict | None:
    """Read one JSON message: all bytes until the peer closes."""
    chunks: list[bytes] = []
    size = 0
    while True:
        chunk = conn.recv(65536)
        if not chunk:
            break
        size += len(chunk)
        if size > _RECV_LIMIT:
            return None
        chunks.append(chunk)
    if not chunks:
        return None
    try:
        msg = json.loads(b"".join(chunks).decode("utf-8"))
    except (UnicodeDecodeError, ValueError):
        return None
    return msg if isinstance(msg, dict) else None


def serve(
    port: int = DEFAULT_PORT,
    pidfile: str = DEFAULT_PIDFILE,
    warmup: bool = False,
) -> int:
    """Run the daemon loop until a shutdown message or SIGTERM/SIGINT.

    ``warmup=True`` (CLI ``--warmup``, or ``SPARK_GRAFT_WARMUP=1``)
    runs :func:`session.warmup_expressions` before the socket opens,
    so the first submitted job never pays the fresh-JVM interpreted
    expression-path cost (measured table in SCALE.md)."""
    from .operators.mapreduce import run_job
    from .session import get_spark, warmup_expressions

    spark = get_spark(app_name="mapreduce-spark-daemon")
    if warmup and os.environ.get("SPARK_GRAFT_WARMUP", "") != "1":
        # (get_spark already warmed when the env var is set)
        chains = warmup_expressions(spark)
        print(f"warmed expression chains: {', '.join(chains)}", flush=True)
    jobs: queue.Queue[dict | None] = queue.Queue()

    def worker() -> None:
        while True:
            job = jobs.get()
            if job is None:
                return
            try:
                outs = run_job(
                    spark,
                    job["input_directory"],
                    job["output_directory"],
                    job["mapper_executable"],
                    job["reducer_executable"],
                    int(job.get("num_mappers", 4)),
                    int(job.get("num_reducers", 1)),
                    compat=bool(job.get("compat", True)),
                )
                print(f"job complete: {len(outs)} output files "
                      f"in {job['output_directory']}", flush=True)
            except Exception as e:  # noqa: BLE001 — daemon must survive bad jobs
                print(f"job failed: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
            finally:
                # Long-lived session hygiene: reclaim any localCheckpoint
                # blocks the finished job materialized (clearCache does
                # not touch RDD-level blocks; see session.release_
                # checkpoints). The job's outputs are already written.
                from .session import release_checkpoints

                release_checkpoints(spark)

    runner = threading.Thread(target=worker, name="job-runner")
    stop_evt = threading.Event()
    srv: socket.socket | None = None
    pidfile_written = False
    # EVERYTHING that can fail (bind EADDRINUSE, pidfile O_EXCL) sits
    # inside the try: the finally must always feed the runner its
    # sentinel and stop Spark, else a non-daemon thread blocked on
    # jobs.get() keeps the process (and its JVM) alive forever.
    try:
        runner.start()
        for sig in (signal.SIGTERM, signal.SIGINT):
            signal.signal(sig, lambda *_: stop_evt.set())

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(8)
        srv.settimeout(0.5)  # poll stop_evt between accepts

        # Auth: a random per-run token, distributed via the owner-only
        # pidfile. TCP gives no portable peer-uid check, and a tokenless
        # localhost port would let ANY local user run arbitrary
        # executables as the daemon's owner — strict reference wire
        # parity (bare netcat) loses to that; the CLI attaches the
        # token automatically.
        token = secrets.token_hex(16)
        # 0600 from the first byte: create-then-chmod would leave a
        # window in which another local user reads the token from the
        # well-known per-uid path. O_EXCL + O_NOFOLLOW: a planted
        # symlink (or a racing daemon) fails the open instead of
        # truncating an attacker-chosen target. A pre-existing pidfile
        # is removed ONLY when its owner is dead (read_pidfile probes
        # liveness) — unconditionally unlinking would orphan a LIVE
        # daemon that won the start race.
        if os.path.exists(pidfile):
            if read_pidfile(pidfile) is not None:
                raise RuntimeError(
                    f"another daemon already owns {pidfile}; "
                    "stop it first or use a different --pidfile"
                )
            Path(pidfile).unlink(missing_ok=True)  # stale: owner is dead
        fd = os.open(
            pidfile,
            os.O_WRONLY | os.O_CREAT | os.O_EXCL | os.O_NOFOLLOW,
            0o600,
        )
        pidfile_written = True
        with os.fdopen(fd, "w") as f:
            f.write(
                json.dumps({"pid": os.getpid(), "port": port, "auth": token})
            )
        print(f"mapreduce-spark daemon listening on 127.0.0.1:{port} "
              f"(spark {spark.version}, pidfile {pidfile})", flush=True)
        while not stop_evt.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            # Per-connection fault isolation: a hostile or broken client
            # (RST mid-read, never-closing socket, non-ASCII auth) must
            # cost one connection, never the daemon. accept() returns a
            # BLOCKING socket regardless of the listener timeout, so an
            # explicit per-connection deadline bounds a client that
            # connects and goes silent.
            try:
                with conn:
                    conn.settimeout(5.0)
                    msg = _recv_json(conn)
            except OSError:
                continue
            if not msg:
                continue
            # Constant-time compare on BYTES: a plain != leaks a timing
            # oracle on the token, and compare_digest on str raises for
            # non-ASCII input (a crash a tokenless client could force).
            supplied = str(msg.get("auth") or "").encode("utf-8", "replace")
            if not hmac.compare_digest(supplied, token.encode("utf-8")):
                print("rejecting message with missing/invalid auth token",
                      file=sys.stderr, flush=True)
                continue
            mtype = msg.get("message_type")
            if mtype == "shutdown":
                print("shutdown message received", flush=True)
                stop_evt.set()
            elif mtype == "new_manager_job":
                jobs.put(msg)
            else:
                print(f"ignoring message_type={mtype!r}",
                      file=sys.stderr, flush=True)
    finally:
        if srv is not None:
            srv.close()
        jobs.put(None)  # drain: queued jobs still run before the sentinel
        if runner.is_alive():
            runner.join()
        spark.stop()
        if pidfile_written:
            Path(pidfile).unlink(missing_ok=True)
        print("mapreduce-spark daemon stopped", flush=True)
    return 0
