"""Docker executor parity against a stub ``docker`` CLI (no dockerd in
this container): container reuse by task-hash name, env injection from
config['env'] newlines, timeout -> kill, non-zero exit -> error, remove
on success / keep on failure (ref internal/core/executor_docker.go:36-128).
"""

from __future__ import annotations

import os
import stat

import pytest

from chyme_spark.runner import docker_executor

STUB = r"""#!/bin/sh
log="$DOCKER_STUB_LOG"
echo "$@" >> "$log"
cmd="$1"
case "$cmd" in
  ps)      [ -f "$DOCKER_STUB_EXISTS" ] && echo "abc123"; exit 0 ;;
  inspect) cat "$DOCKER_STUB_BINDS" 2>/dev/null; exit 0 ;;
  create)  exit 0 ;;
  start)   exit 0 ;;
  wait)    [ -n "$DOCKER_STUB_WAIT_SLEEP" ] && sleep "$DOCKER_STUB_WAIT_SLEEP"
           cat "$DOCKER_STUB_EXIT" 2>/dev/null || echo 0; exit 0 ;;
  logs)    echo "container log tail"; exit 0 ;;
  kill)    exit 0 ;;
  rm)      rm -f "$DOCKER_STUB_EXISTS"; exit 0 ;;
  *)       exit 1 ;;
esac
"""


@pytest.fixture()
def stub(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    path = bindir / "docker"
    path.write_text(STUB)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    log = tmp_path / "docker.log"
    log.write_text("")
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    monkeypatch.setenv("DOCKER_STUB_LOG", str(log))
    monkeypatch.setenv("DOCKER_STUB_EXISTS", str(tmp_path / "exists.flag"))
    monkeypatch.setenv("DOCKER_STUB_EXIT", str(tmp_path / "exit.code"))
    monkeypatch.setenv("DOCKER_STUB_BINDS", str(tmp_path / "binds.txt"))
    monkeypatch.delenv("DOCKER_STUB_WAIT_SLEEP", raising=False)
    return tmp_path


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


def _log(stub):
    return (stub / "docker.log").read_text().splitlines()


def test_create_start_wait_remove_success(stub):
    task = _task(env="A=1\nB=two", user="1000")
    res = docker_executor(task, _ws(stub))
    assert res.ok, res.error
    lines = _log(stub)
    verbs = [ln.split()[0] for ln in lines]
    assert verbs == ["ps", "create", "start", "wait", "rm"]
    create = next(ln for ln in lines if ln.startswith("create"))
    # binds, user and each env k=v injected, image last
    assert ":/in" in create and ":/out" in create
    assert "--user 1000" in create
    assert "-e A=1" in create and "-e B=two" in create
    assert create.split()[-1] == "img:1"
    assert "--name chyme-deadbeef" in create


def test_container_reuse_skips_create(stub):
    (stub / "exists.flag").write_text("")
    ws = _ws(stub)
    (stub / "binds.txt").write_text(f"{ws['input']}:/in\n{ws['output']}:/out\n")
    res = docker_executor(_task(), ws)
    assert res.ok, res.error
    verbs = [ln.split()[0] for ln in _log(stub)]
    assert "create" not in verbs
    assert verbs[:4] == ["ps", "inspect", "start", "wait"]


def test_container_reuse_rejects_stale_binds(stub):
    """A kept container whose binds point at a previous (deleted)
    workspace tempdir must be removed and recreated, not restarted on
    empty mounts (round-6 review finding)."""
    (stub / "exists.flag").write_text("")
    (stub / "binds.txt").write_text("/gone/old-ws/input:/in\n/gone/old-ws/output:/out\n")
    res = docker_executor(_task(), _ws(stub))
    assert res.ok, res.error
    verbs = [ln.split()[0] for ln in _log(stub)]
    # rm of the stale container, then a fresh ps+create path
    assert verbs[:3] == ["ps", "inspect", "rm"]
    assert "create" in verbs


def test_nonzero_exit_is_error_and_container_kept(stub):
    (stub / "exit.code").write_text("2\n")
    res = docker_executor(_task(), _ws(stub))
    assert not res.ok
    assert "exit 2" in res.error
    verbs = [ln.split()[0] for ln in _log(stub)]
    assert "rm" not in verbs  # kept for the retry to reuse


def test_timeout_kills_container(stub, monkeypatch):
    monkeypatch.setenv("DOCKER_STUB_WAIT_SLEEP", "5")
    task = _task()
    task["timeout_s"] = 1
    res = docker_executor(task, _ws(stub))
    assert not res.ok
    assert "timeout" in res.error
    assert "kill" in [ln.split()[0] for ln in _log(stub)]


def test_missing_image_config(stub):
    res = docker_executor({"task_hash": "x", "config": {}}, _ws(stub))
    assert not res.ok and "image" in res.error


def test_gates_cleanly_without_docker_cli(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # empty dir: no docker
    res = docker_executor(_task(), _ws(tmp_path))
    assert not res.ok and "PATH" in res.error
