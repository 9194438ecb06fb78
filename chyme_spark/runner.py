"""Task runner — the reference's worker service re-expressed as a
distributed Spark stage.

The reference long-polls SQS one message at a time and runs a 6-stage
state machine per task: workspace -> download -> execute -> metadata ->
upload -> complete (ref ``internal/worker/service.go:131-183``), with
hooks around stages (ref ``internal/worker/hooks/hooks.go:10-35``),
scheme-dispatched loaders (ref ``internal/core/loader.go:26-91``),
executor registry (ref ``internal/core/executor.go:51-80``), DLQ on
failure (ref ``internal/core/task.go:132-147``).

Here the task table IS the queue: ``run_tasks`` partitions the tasks
DataFrame and executes the same stage machine inside ``mapInPandas`` —
one Arrow batch of tasks per Python worker, workspace on executor-local
disk, results (ledger rows + quarantine rows) returned as a DataFrame.
Spark's scheduler replaces the visibility-timeout dance: a failed
partition is retried by the engine, and idempotence comes from the
ledger anti-join upstream (tasker.create_tasks).

Scale: parallelism = partitions (configure with ``repartition`` before
calling); no driver involvement per task; executor-local scratch only.
The Docker executor is out of scope in this container — the registry
dispatches to ``subprocess``/``noop`` payloads and Docker is gated
behind an import-try exactly like other missing codecs.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import traceback
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from urllib.parse import urlparse

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# stages (ref internal/worker/service.go:119-128)
# ---------------------------------------------------------------------------

STAGES = ("start", "download", "execute", "metadata", "upload", "complete")


# ---------------------------------------------------------------------------
# loaders: scheme -> transfer behavior (ref internal/core/loader.go:26-117)
# ---------------------------------------------------------------------------


class Loader:
    def download(self, url: str, dest_dir: str) -> int:
        raise NotImplementedError

    def upload(self, src_dir: str, url: str) -> int:
        raise NotImplementedError


class FileLoader(Loader):
    """file:// transfers — the testable stand-in for the S3 loader."""

    def download(self, url: str, dest_dir: str) -> int:
        src = urlparse(url).path
        total = 0
        if os.path.isdir(src):
            for name in sorted(os.listdir(src)):
                p = os.path.join(src, name)
                if os.path.isfile(p):
                    shutil.copy(p, os.path.join(dest_dir, name))
                    total += os.path.getsize(p)
        else:
            shutil.copy(src, os.path.join(dest_dir, os.path.basename(src)))
            total = os.path.getsize(src)
        return total

    def upload(self, src_dir: str, url: str) -> int:
        dest = urlparse(url).path
        os.makedirs(dest, exist_ok=True)
        total = 0
        for name in sorted(os.listdir(src_dir)):
            p = os.path.join(src_dir, name)
            if os.path.isfile(p):
                shutil.copy(p, os.path.join(dest, name))
                total += os.path.getsize(p)
        return total


class PhonyLoader(Loader):
    """No-op transfers (ref phony loader internal/core/loader.go:93-117)."""

    def download(self, url: str, dest_dir: str) -> int:
        return 0

    def upload(self, src_dir: str, url: str) -> int:
        return 0


def _s3_loader() -> Loader:
    """S3 loader requires boto3/hadoop-aws creds; gate behind import-try
    (ref pkg/aws/s3.go:28-39 — list/download/upload/delete surface)."""
    try:
        import boto3  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "s3 loader needs boto3 (or run via s3a:// reads); not present in this container"
        ) from None
    raise NotImplementedError("s3 transfer path intentionally unimplemented in v1")


DEFAULT_LOADERS: dict[str, Callable[[], Loader]] = {
    "file": FileLoader,
    "phony": PhonyLoader,
    "s3": _s3_loader,
}


# ---------------------------------------------------------------------------
# executors (ref internal/core/executor.go:51-80, executor_docker.go:36-113)
# ---------------------------------------------------------------------------


@dataclass
class ExecutionResult:
    ok: bool
    error: str = ""
    metadata: dict[str, str] | None = None


def noop_executor(task: dict, workspace: dict[str, str]) -> ExecutionResult:
    """Copy input -> output untouched; always succeeds."""
    for name in sorted(os.listdir(workspace["input"])):
        shutil.copy(os.path.join(workspace["input"], name), os.path.join(workspace["output"], name))
    return ExecutionResult(ok=True, metadata={"files": str(len(os.listdir(workspace["output"])))})


def subprocess_executor(task: dict, workspace: dict[str, str]) -> ExecutionResult:
    """Run the command in config.cmd with $IN/$OUT substituted — the
    engine analog of the ffmpeg container payload (ref
    images/mov/process_mov.sh:3-8), minus Docker."""
    cmd = (task.get("config") or {}).get("cmd")
    if not cmd:
        return ExecutionResult(ok=False, error="subprocess executor needs config['cmd']")
    env = {**os.environ, "IN": workspace["input"], "OUT": workspace["output"]}
    timeout = int(task.get("timeout_s") or 3600)
    try:
        proc = subprocess.run(
            ["/bin/sh", "-c", cmd], env=env, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return ExecutionResult(ok=False, error=f"timeout after {timeout}s")
    if proc.returncode != 0:
        return ExecutionResult(ok=False, error=f"exit {proc.returncode}: {proc.stderr[-500:]}")
    return ExecutionResult(ok=True, metadata={"stdout_tail": proc.stdout[-200:]})


def _docker_executor(task: dict, workspace: dict[str, str]) -> ExecutionResult:
    try:
        import docker  # noqa: F401
    except ImportError:
        return ExecutionResult(ok=False, error="docker sdk not available in this container")
    return ExecutionResult(ok=False, error="docker execution path intentionally unimplemented in v1")


DEFAULT_EXECUTORS: dict[str, Callable[[dict, dict], ExecutionResult]] = {
    "noop": noop_executor,
    "subprocess": subprocess_executor,
    "docker": _docker_executor,
}


# ---------------------------------------------------------------------------
# hooks (ref internal/worker/hooks/hooks.go:10-35)
# ---------------------------------------------------------------------------


class Hooks:
    """Base no-op hooks; subclass and register to intercept stages."""

    def pre_download(self, task: dict) -> None: ...

    def pre_execute(self, task: dict) -> None: ...

    def pre_upload(self, task: dict) -> None: ...

    def post_upload(self, task: dict) -> None: ...


DEFAULT_HOOKS: dict[str, type[Hooks]] = {"mov": Hooks, "mp4": Hooks, "": Hooks}


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("task_hash", T.StringType()),
        T.StructField("template", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("bytes_out", T.LongType()),
    ]
)


def _process_one(
    task: dict,
    loaders: dict[str, Callable[[], Loader]],
    executors: dict[str, Callable[[dict, dict], ExecutionResult]],
    hooks_registry: dict[str, type[Hooks]],
    workdir: str,
) -> dict:
    """The 6-stage machine for one task (ref internal/worker/service.go:131-183)."""
    stage = "start"
    bytes_in = bytes_out = 0
    try:
        hooks_cls = hooks_registry.get(task.get("template") or "")
        if hooks_cls is None:
            # unknown hooks -> quarantine (ref service.go:86-89 DLQs it)
            return dict(task_hash=task["task_hash"], template=task.get("template"),
                        stage=stage, ok=False, error=f"unknown hooks {task.get('template')!r}",
                        bytes_in=0, bytes_out=0)
        hooks = hooks_cls()

        def loader_for(url: str) -> Loader:
            scheme = "phony" if task.get("phony") else urlparse(url).scheme
            factory = loaders.get(scheme)
            if factory is None:
                raise ValueError(f"no loader for scheme {scheme!r}")
            return factory()

        # start: workspace (ref internal/core/task.go:205-224)
        ws_root = os.path.join(workdir, task["task_hash"])
        ws = {k: os.path.join(ws_root, k) for k in ("input", "output", "internal")}
        for p in ws.values():
            os.makedirs(p, exist_ok=True)

        stage = "download"
        hooks.pre_download(task)
        bytes_in = loader_for(task["input_url"]).download(task["input_url"], ws["input"])

        stage = "execute"
        hooks.pre_execute(task)
        executor = executors.get(task.get("executor") or "")
        if executor is None:
            raise ValueError(f"unknown executor {task.get('executor')!r}")
        result = executor(task, ws)
        if not result.ok:
            raise RuntimeError(result.error)

        stage = "metadata"
        if result.metadata and task.get("metadata_url"):
            meta_dir = os.path.join(ws["internal"], "metadata")
            os.makedirs(meta_dir, exist_ok=True)
            with open(os.path.join(meta_dir, "metadata.txt"), "w") as f:
                for k, v in sorted(result.metadata.items()):
                    f.write(f"{k}={v}\n")
            loader_for(task["metadata_url"]).upload(meta_dir, task["metadata_url"])

        stage = "upload"
        hooks.pre_upload(task)
        bytes_out = loader_for(task["output_url"]).upload(ws["output"], task["output_url"])
        hooks.post_upload(task)

        stage = "complete"
        shutil.rmtree(ws_root, ignore_errors=True)
        return dict(task_hash=task["task_hash"], template=task.get("template"),
                    stage=stage, ok=True, error="", bytes_in=bytes_in, bytes_out=bytes_out)
    except Exception as e:  # noqa: BLE001 — any failure quarantines the task
        return dict(task_hash=task.get("task_hash"), template=task.get("template"),
                    stage=stage, ok=False,
                    error=f"{type(e).__name__}: {e}"[:500] or traceback.format_exc()[-500:],
                    bytes_in=bytes_in, bytes_out=bytes_out)


def run_tasks(
    tasks: DataFrame,
    loaders: dict[str, Callable[[], Loader]] | None = None,
    executors: dict[str, Callable[[dict, dict], ExecutionResult]] | None = None,
    hooks_registry: dict[str, type[Hooks]] | None = None,
) -> DataFrame:
    """Execute every task row; returns the result ledger DataFrame.

    Failed rows carry (stage, error) — the quarantine/DLQ analog: filter
    ``ok == False`` and append to the quarantine table (ref Fail ->
    DLQ ``internal/core/task.go:132-147``).
    """
    loaders = loaders or DEFAULT_LOADERS
    executors = executors or DEFAULT_EXECUTORS
    hooks_registry = hooks_registry or DEFAULT_HOOKS

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        workdir = tempfile.mkdtemp(prefix="chyme_ws_")
        for pdf in batches:
            out = [
                _process_one(row, loaders, executors, hooks_registry, workdir)
                for row in pdf.to_dict("records")
            ]
            yield pd.DataFrame(out, columns=[f.name for f in RESULT_SCHEMA.fields])
        shutil.rmtree(workdir, ignore_errors=True)

    return tasks.mapInPandas(process, RESULT_SCHEMA)
