"""CLI smoke tests (factstore-cli analog): drive python -m
factstore_spark as a real subprocess against a temp root, both
backends; plus the serve-rpc command over the wire channel."""

import json
import socket
import subprocess
import sys
import time

import pytest

ENV_BASE = {"FACTSTORE_ROOT": ""}


def run_cli(root, *args, backend="flock"):
    out = subprocess.run(
        [sys.executable, "-m", "factstore_spark", "--root", root, "--backend", backend, *args],
        capture_output=True,
        text=True,
        timeout=180,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(line) for line in out.stdout.splitlines() if line.strip()]


@pytest.mark.parametrize("backend", ["flock", "optimistic"])
def test_cli_lifecycle(tmp_path, backend):
    root = str(tmp_path / "engine")
    assert run_cli(root, "create-store", "s", backend=backend)[0]["result"] == "StoreCreated"
    res = run_cli(
        root, "append", "s", "--type", "T", "--subject", "x",
        "--payload", '{"v":1}', "--tag", "k=v", backend=backend,
    )[0]
    assert res["result"] == "Appended" and len(res["fact_ids"]) == 1
    rows = run_cli(root, "find-by-subject", "s", "x", backend=backend)
    assert len(rows) == 1 and rows[0]["type"] == "T" and rows[0]["tags"] == {"k": "v"}
    stores = run_cli(root, "list-stores", backend=backend)
    assert [s["name"] for s in stores] == ["s"]


def test_cli_serve_rpc_roundtrip(tmp_path):
    """serve-rpc boots a real wire server; talk to it with RpcChannel."""
    sys.path.insert(0, "/root/repo")
    from factstore_spark.rpc import RpcChannel

    root = str(tmp_path / "engine")
    # free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    proc = subprocess.Popen(
        [sys.executable, "-m", "factstore_spark", "--root", root,
         "serve-rpc", "--port", str(port)],
        stdout=subprocess.PIPE,
        text=True,
        cwd="/root/repo",
    )
    try:
        line = proc.stdout.readline()
        assert json.loads(line)["serving"] == "rpc"
        ch = RpcChannel("127.0.0.1", port)
        assert "created" in ch.unary("StoreService", "CreateStore", {"name": "s"})
        res = ch.unary(
            "FactService",
            "AppendFacts",
            {"storeName": "s", "facts": [{"type": "T", "subject": "x"}]},
        )
        assert "appended" in res
        info = ch.unary("InfoService", "GetServerInfo", {})
        assert info["app"] == "factstore-spark"
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
