"""F16 CLI daemon lifecycle + E5 straggler (speculation) tests.

The daemon plane mirrors the reference's manager process: the CLI's
start/stop/restart/status verbs (reference bin/mapreduce:36-94) manage
a warm-SparkSession process that accepts the reference's own TCP JSON
messages — ``new_manager_job`` (mapreduce/submit.py:68-76) and
``shutdown`` (bin/mapreduce:22).
"""

from __future__ import annotations

import filecmp
import socket
import subprocess
import sys
import time

from .conftest import REF_TESTDATA, needs_reference

INPUT = REF_TESTDATA / "input"
EXEC = REF_TESTDATA / "exec"
CORRECT = REF_TESTDATA / "correct"


def _cli(*args: str, timeout: float = 120.0) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "mapreduce_server_development_spark.cli", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/root/repo",
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@needs_reference
def test_daemon_lifecycle_and_remote_submit(tmp_path):
    """start → status → double-start error → two fire-and-forget submits
    (FIFO) → byte-exact golden outputs → stop → status."""
    port = _free_port()
    pidfile = str(tmp_path / "daemon.pid")
    # --warmup: the opt-in startup JIT pre-warm (r9 verdict ask #5)
    # rides the normal lifecycle — its log line is asserted below.
    opts = ["--port", str(port), "--pidfile", pidfile, "--warmup"]

    res = _cli("start", *opts)
    assert res.returncode == 0, res.stderr[-2000:]
    try:
        res = _cli("status", *opts)
        assert "manager running" in res.stdout

        # the startup hook ran before the socket opened (start polls
        # the pidfile, which is written after warmup completes)
        log = (tmp_path / "daemon.log").read_text()
        assert "warmed expression chains: minhash_md5, gram_md5, array_dot" in log

        # Reference parity: starting twice is an error (bin/mapreduce:48-55).
        res = _cli("start", *opts)
        assert res.returncode == 1
        assert "already running" in res.stderr

        # An unauthenticated message must be ignored (no token from the
        # owner-only pidfile -> any local user could otherwise run
        # executables as the daemon owner). Daemon must survive it.
        import json as _json
        import socket as _socket
        from pathlib import Path as _Path

        with _socket.create_connection(("127.0.0.1", port), timeout=5) as s:
            s.sendall(_json.dumps({"message_type": "shutdown"}).encode())
        time.sleep(1.0)
        res = _cli("status", *opts)
        assert "manager running" in res.stdout

        # Hostile clients must cost one connection, never the daemon:
        # a NON-ASCII auth string (hmac.compare_digest on str raises
        # TypeError for those) and an abortive RST close mid-exchange.
        with _socket.create_connection(("127.0.0.1", port), timeout=5) as s:
            s.sendall(
                _json.dumps(
                    {"message_type": "shutdown", "auth": "über"}
                ).encode("utf-8")
            )
        s2 = _socket.create_connection(("127.0.0.1", port), timeout=5)
        s2.setsockopt(
            _socket.SOL_SOCKET,
            _socket.SO_LINGER,
            __import__("struct").pack("ii", 1, 0),  # RST on close
        )
        s2.sendall(b'{"half')
        s2.close()
        time.sleep(1.0)
        res = _cli("status", *opts)
        assert "manager running" in res.stdout

        # restart = stop + start (bin/mapreduce:86-89): new pid, still up.

        old_pid = _json.loads(_Path(pidfile).read_text())["pid"]
        res = _cli("restart", *opts, timeout=180.0)
        assert res.returncode == 0, res.stderr[-2000:]
        new_pid = _json.loads(_Path(pidfile).read_text())["pid"]
        assert new_pid != old_pid
        res = _cli("status", *opts)
        assert "manager running" in res.stdout

        # Two jobs, fire-and-forget: the daemon runs them FIFO (F9).
        for tag, mapper, reducer, golden in [
            ("wc", "wc_map.sh", "wc_reduce.sh", "word_count_correct.txt"),
            ("grep", "grep_map.py", "grep_reduce.py", "grep_correct.txt"),
        ]:
            res = _cli(
                "submit", "--remote", *opts,
                "-i", str(INPUT),
                "-o", str(tmp_path / tag),
                "-m", str(EXEC / mapper),
                "-r", str(EXEC / reducer),
                "--nmappers", "2", "--nreducers", "1",
            )
            assert res.returncode == 0, res.stderr[-2000:]
            assert "Submitted job to manager" in res.stdout

        deadline = time.time() + 120
        outs = {tag: tmp_path / tag / "outputfile01" for tag in ("wc", "grep")}
        while time.time() < deadline and not all(p.exists() for p in outs.values()):
            time.sleep(0.5)
        time.sleep(1.0)  # let the final rename settle
        assert filecmp.cmp(CORRECT / "word_count_correct.txt", outs["wc"], shallow=False)
        assert filecmp.cmp(CORRECT / "grep_correct.txt", outs["grep"], shallow=False)
    finally:
        res = _cli("stop", *opts)
    assert res.returncode == 0, res.stderr[-2000:]
    res = _cli("status", *opts)
    assert "manager not running" in res.stdout

    # With the daemon down there is no auth token: remote submit must
    # fail FAST and loudly, not fire a job the daemon would silently
    # reject.
    res = _cli("submit", "--remote", *opts, "-i", str(INPUT),
               "-o", str(tmp_path / "late"))
    assert res.returncode == 1
    assert "no running daemon" in res.stderr


@needs_reference
def test_slow_executables_with_speculation(tmp_path):
    """E5: the reference ships wc_map_slow.sh/wc_reduce_slow.sh purely
    to exercise straggler handling; Spark's analog is speculative
    execution. Run the slow variants under ``spark.speculation=true``
    (quantile/multiplier floored so stragglers actually trigger
    speculative attempts) — results must stay byte-exact: duplicate
    speculative attempts are discarded by the scheduler, never doubled
    into output. Needs its own session (speculation is fixed at session
    creation), so it runs in a subprocess."""
    code = f"""
import sys
sys.path.insert(0, '/root/repo')
import filecmp
from pyspark.sql import SparkSession
from mapreduce_server_development_spark.operators import run_job
spark = (SparkSession.builder.master('local[8]')
         .config('spark.speculation', 'true')
         .config('spark.speculation.interval', '1s')
         .config('spark.speculation.quantile', '0.25')
         .config('spark.speculation.multiplier', '1.1')
         .getOrCreate())
outs = run_job(spark, {str(INPUT)!r}, {str(tmp_path / 'out')!r},
               {str(EXEC / 'wc_map_slow.sh')!r},
               {str(EXEC / 'wc_reduce_slow.sh')!r}, 4, 1)
assert filecmp.cmp({str(CORRECT / 'word_count_correct.txt')!r}, outs[0], shallow=False)
print('SPECULATION_OK')
"""
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "SPECULATION_OK" in res.stdout, res.stderr[-2000:]


def test_pidfile_identity_probe(tmp_path):
    """A live pid whose /proc cmdline is NOT this package (pid recycled
    after a SIGKILL'd daemon) must read as 'not running' so status and
    start do not act on a stranger process."""
    import json
    import subprocess
    import sys

    from mapreduce_server_development_spark import daemon as daemonmod

    proc = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(30)"]
    )
    try:
        pf = tmp_path / "stale.pid"
        pf.write_text(json.dumps({"pid": proc.pid, "port": 1}))
        assert daemonmod.read_pidfile(str(pf)) is None
        assert not daemonmod._looks_like_daemon(proc.pid)
    finally:
        proc.kill()
        proc.wait()


def test_runtime_dir_is_private(monkeypatch, tmp_path):
    """The pidfile fallback directory is per-user 0700 under TMPDIR
    (never a bare world-writable /tmp path)."""
    import os
    import stat

    from mapreduce_server_development_spark import daemon as daemonmod

    monkeypatch.delenv("XDG_RUNTIME_DIR", raising=False)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    d = daemonmod._runtime_dir()
    assert d.startswith(str(tmp_path))
    mode = stat.S_IMODE(os.lstat(d).st_mode)
    assert mode == 0o700


def test_console_script_trio(tmp_path):
    """Reference-parity aliases: mapreduce-worker (status check) exits
    nonzero with no daemon; mapreduce-submit requires the daemon (the
    reference's fire-and-forget needs a manager to hit); all three are
    declared as console scripts in pyproject."""
    import tomllib

    from mapreduce_server_development_spark.cli import submit_main, worker_main

    pidfile = str(tmp_path / "none.pid")
    assert worker_main(["--pidfile", pidfile]) != 0
    assert submit_main(["--pidfile", pidfile]) != 0

    with open("pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    for name in ("mapreduce-manager", "mapreduce-worker", "mapreduce-submit"):
        mod, func = scripts[name].split(":")
        import importlib

        assert callable(getattr(importlib.import_module(mod), func))


def test_warmup_expressions_unit(spark):
    """The product warm-up hook runs on synthetic in-memory data (no
    fixture dependency), is idempotent, and names its chains."""
    from mapreduce_server_development_spark.session import warmup_expressions

    chains = warmup_expressions(spark, rows=500)
    assert chains == ["minhash_md5", "gram_md5", "array_dot"]
    assert warmup_expressions(spark, rows=500) == chains
