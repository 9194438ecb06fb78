"""Docker executor end-to-end against a live (fake) Docker Engine API
daemon (VERDICT r8 #7): the executor's state machine — reuse-by-name,
stale-bind recreate, timeout->kill, keep-on-failure/remove-on-success —
exercised over the real wire protocol (HTTP Engine API + a faithful CLI
shim), not a canned-output stub.  Parity target:
ref internal/core/executor_docker.go:36-128.
"""

from __future__ import annotations

import os
import stat
import sys

import pytest

from chyme_spark.runner import docker_executor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fake_dockerd import CLI_SHIM, FakeDockerDaemon  # noqa: E402


@pytest.fixture()
def daemon():
    d = FakeDockerDaemon().start()
    yield d
    d.stop()


@pytest.fixture()
def cli(tmp_path, monkeypatch, daemon):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    path = bindir / "docker"
    path.write_text(CLI_SHIM.replace("#!/usr/bin/env python3", f"#!{sys.executable}", 1))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("DOCKER_HOST", f"tcp://127.0.0.1:{daemon.port}")
    return daemon


def _ws(tmp_path):
    ws = {}
    for k in ("input", "output", "internal"):
        d = tmp_path / "ws" / k
        d.mkdir(parents=True, exist_ok=True)
        ws[k] = str(d)
    return ws


def _task(**cfg):
    return {"task_hash": "deadbeef", "executor": "docker", "timeout_s": 60,
            "config": {"image": "img:1", **cfg}}


def test_success_path_create_start_wait_remove(cli, tmp_path):
    res = docker_executor(_task(env="A=1\nB=two", user="1000"), _ws(tmp_path))
    assert res.ok, res.error
    # wire-level sequence: list -> create -> start -> wait -> delete
    paths = [p for _, p in cli.requests]
    assert paths[0] == "/containers/json"
    assert "/containers/create" in paths
    assert any(p.endswith("/start") for p in paths)
    assert any(p.endswith("/wait") for p in paths)
    assert cli.requests[-1][0] == "DELETE"
    # the daemon saw the real create body: binds, env, user landed
    assert cli.create_count == 1
    assert cli.containers == {}  # removed on success


def test_create_body_carries_binds_env_user(cli, tmp_path):
    # The daemon records the last create body at request time, so the
    # assertion is race-free: no snapshot thread chasing a container the
    # success path deletes (the earlier thread-based version flaked
    # whenever the 0.2 s simulated process finished before the thread
    # was ever scheduled).
    ws = _ws(tmp_path)
    res = docker_executor(_task(env="A=1\nB=two", user="1000"), ws)
    assert res.ok, res.error
    body = cli.last_create
    assert body is not None and body["name"] == "chyme-deadbeef"
    assert body["image"] == "img:1"
    assert set(body["binds"]) == {f"{ws['input']}:/in", f"{ws['output']}:/out"}
    assert set(body["env"]) == {"A=1", "B=two"}
    assert body["user"] == "1000"


def test_reuse_by_name_skips_create(cli, tmp_path):
    ws = _ws(tmp_path)
    cli.seed("chyme-deadbeef", "img:1",
             [f"{ws['input']}:/in", f"{ws['output']}:/out"])
    res = docker_executor(_task(), ws)
    assert res.ok, res.error
    assert cli.create_count == 0  # restarted the existing container
    paths = [p for _, p in cli.requests]
    assert any(p.endswith("/start") for p in paths)


def test_stale_binds_force_recreate(cli, tmp_path):
    """A kept container bound to a previous (deleted) workspace must be
    removed and recreated, not restarted on empty mounts."""
    ws = _ws(tmp_path)
    cli.seed("chyme-deadbeef", "img:1",
             ["/gone/old/input:/in", "/gone/old/output:/out"])
    res = docker_executor(_task(), ws)
    assert res.ok, res.error
    assert cli.create_count == 1  # fresh create after the stale rm
    methods = [(m, p) for m, p in cli.requests if m == "DELETE"]
    assert len(methods) == 2  # stale rm + remove-on-success


def test_nonzero_exit_keeps_container_for_retry(cli, tmp_path):
    cli.exit_code = 2
    res = docker_executor(_task(), _ws(tmp_path))
    assert not res.ok
    assert "exit 2" in res.error
    assert "chyme-deadbeef" in cli.containers  # kept for the retry
    # the retry then reuses it: same binds -> no second create
    ws2 = _ws(tmp_path)
    cli.exit_code = 0
    res2 = docker_executor(_task(), ws2)
    assert res2.ok, res2.error
    assert cli.create_count == 1  # still just the first create
    assert cli.containers == {}  # removed after the successful retry


def test_timeout_kills_container_over_the_wire(cli, tmp_path):
    cli.runtime_s = 30.0
    task = _task()
    task["timeout_s"] = 1
    res = docker_executor(task, _ws(tmp_path))
    assert not res.ok
    assert "timeout" in res.error
    assert any(p.endswith("/kill") for _, p in cli.requests)
    c = cli.containers.get("chyme-deadbeef")
    assert c is not None and c.status == "exited" and c.exit_code == 137


def test_pull_requested_hits_images_create(cli, tmp_path):
    res = docker_executor(_task(pull=True), _ws(tmp_path))
    assert res.ok, res.error
    assert cli.pulled == ["img:1"]
