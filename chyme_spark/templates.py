"""Task templates — declarative port of the reference's template
registry (ref ``internal/tasker/template.go:7-35``).

A template is a guarded struct expression: given catalog columns it
either produces a task struct or NULL (extension mismatch), exactly the
1 resource -> 0..N tasks fan-out of the reference's ``Templater.Create``.
The expansion is ``explode(array(<template structs>))`` +
``filter(isNotNull)`` — a narrow transformation: no shuffle, arbitrary
scale.

Task identity is the order-insensitive digest of the input+output
resource hashes (ref ``internal/core/task.go:44-50``,
``pkg/hash/hash.go:26-40`` collates sorted hashes before digesting; we
sort with least/greatest). sha1 kept for parity with the reference.

The reference's MOV/MP4 templates set a 48 h timeout via the wrong
constant (ref ``internal/tasker/template/mov.go:43`` uses
``mie4nitfTimeout``); we give each template its own timeout — the bug is
documented, not reproduced.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Template:
    """Declarative task template (ref ``internal/tasker/template/mov.go:21-46``)."""

    name: str
    ext: str  # guard: lowercased extension that activates this template
    mirror_base: str  # e.g. "s3://chyme-mirror/dash" or "file:///data/mirror"
    image: str
    executor: str = "docker"
    timeout_s: int = 6 * 3600
    extra_config: dict[str, str] = field(default_factory=dict)

    def output_url(self) -> Column:
        # <mirror_base>/<src-bucket>/<key>/ — same rewrite as the
        # reference (ref internal/tasker/template/mov.go:28-30)
        return F.concat(
            F.lit(self.mirror_base.rstrip("/") + "/"),
            F.col("bucket"),
            F.lit("/"),
            F.col("key"),
            F.lit("/"),
        )

    def task_struct(self) -> Column:
        """NULL unless the extension guard matches (0-or-1 fan-out arm)."""
        out_url = self.output_url()
        in_hash = F.col("resource_hash")
        out_hash = F.sha1(out_url)
        config_pairs: list[Column] = []
        for k, v in sorted({"image": self.image, **self.extra_config}.items()):
            config_pairs.extend([F.lit(k), F.lit(v)])
        task = F.struct(
            F.sha1(F.concat(F.least(in_hash, out_hash), F.greatest(in_hash, out_hash))).alias("task_hash"),
            F.col("url").alias("input_url"),
            out_url.alias("output_url"),
            F.concat(out_url, F.lit("metadata/")).alias("metadata_url"),
            F.lit(self.name).alias("template"),
            F.lit(self.executor).alias("executor"),
            F.create_map(*config_pairs).alias("config"),
            F.lit(self.timeout_s).cast("long").alias("timeout_s"),
            F.lit("v1").alias("version"),
            # propagate the skip-transfer flag (ref resource.go:18 Phony)
            F.col("phony").alias("phony"),
        )
        return F.when(F.col("ext") == self.ext.lower(), task)


MOV = Template(
    name="mov",
    ext="mov",
    mirror_base="s3://chyme-mirror/dash",
    image="mov_converter:0.1",
)

MP4 = Template(
    name="mp4",
    ext="mp4",
    mirror_base="s3://chyme-mirror/dash",
    image="mp4_processor:0.1",
)

def with_overrides(
    templates: tuple[Template, ...],
    mirror_base: str | None = None,
    executor: str | None = None,
    cmd: str | None = None,
) -> tuple[Template, ...]:
    """Re-target templates (e.g. file:// mirror + subprocess payload)."""
    from dataclasses import replace

    out = []
    for t in templates:
        kw = {}
        if mirror_base:
            kw["mirror_base"] = mirror_base
        if executor:
            kw["executor"] = executor
        if cmd:
            kw["extra_config"] = {**t.extra_config, "cmd": cmd}
        out.append(replace(t, **kw) if kw else t)
    return tuple(out)

DEFAULT_TEMPLATES: tuple[Template, ...] = (MOV, MP4)


def expand(catalog: DataFrame, templates: tuple[Template, ...] = DEFAULT_TEMPLATES) -> DataFrame:
    """1 resource -> 0..N task rows (ref ``internal/tasker/template.go:26-35``)."""
    arms = F.array(*[t.task_struct() for t in templates])
    return (
        catalog.select(F.explode(arms).alias("task"))
        .filter(F.col("task").isNotNull())
        .select("task.*")
    )
