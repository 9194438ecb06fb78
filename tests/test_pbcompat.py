"""Unit tests for chyme_spark.pbcompat's shim construction (r9).

The TWS operators depend on _shim_dir exposing EXACTLY google/protobuf
(nothing else from the SDK bundle — r9 review finding #2) and healing a
stale symlink left by a previous runtime location.
"""

from __future__ import annotations

import os

from chyme_spark import pbcompat


def _fake_runtime(tmp_path, name="rt"):
    rt = tmp_path / name
    (rt / "google" / "protobuf").mkdir(parents=True)
    (rt / "google" / "protobuf" / "runtime_version.py").write_text(
        "OSS_MAJOR = 6\nMAJOR = OSS_MAJOR\n"
    )
    # bundle junk that must NOT be exposed through the shim
    (rt / "google" / "auth").mkdir()
    (rt / "api_server.py").write_text("")
    return str(rt)


def test_shim_exposes_only_protobuf(tmp_path, monkeypatch):
    monkeypatch.setattr(pbcompat, "_SHIM_ROOT", str(tmp_path / "shim"))
    rt = _fake_runtime(tmp_path)
    shim = pbcompat._shim_dir(rt)
    assert os.path.islink(os.path.join(shim, "google", "protobuf"))
    assert os.readlink(os.path.join(shim, "google", "protobuf")) == os.path.join(
        rt, "google", "protobuf"
    )
    # namespace-portion shape: no __init__.py, and none of the bundle junk
    assert not os.path.exists(os.path.join(shim, "google", "__init__.py"))
    assert not os.path.exists(os.path.join(shim, "google", "auth"))
    assert not os.path.exists(os.path.join(shim, "api_server.py"))
    assert sorted(os.listdir(os.path.join(shim, "google"))) == ["protobuf"]


def test_shim_heals_a_stale_symlink(tmp_path, monkeypatch):
    monkeypatch.setattr(pbcompat, "_SHIM_ROOT", str(tmp_path / "shim"))
    rt1 = _fake_runtime(tmp_path, "rt1")
    rt2 = _fake_runtime(tmp_path, "rt2")
    shim1 = pbcompat._shim_dir(rt1)
    link = os.path.join(shim1, "google", "protobuf")
    assert os.readlink(link) == os.path.join(rt1, "google", "protobuf")
    shim2 = pbcompat._shim_dir(rt2)  # runtime moved -> symlink must follow
    assert shim2 == shim1
    assert os.readlink(link) == os.path.join(rt2, "google", "protobuf")
    # idempotent on repeat
    assert pbcompat._shim_dir(rt2) == shim1
    assert os.readlink(link) == os.path.join(rt2, "google", "protobuf")


def test_find_protobuf_runtime_rejects_old_major(tmp_path, monkeypatch):
    rt = tmp_path / "old"
    (rt / "google" / "protobuf").mkdir(parents=True)
    (rt / "google" / "protobuf" / "runtime_version.py").write_text("OSS_MAJOR = 4\n")
    monkeypatch.setattr(pbcompat, "_CANDIDATE_DIRS", [str(rt)])

    import sys

    # only meaningful when no native runtime shadows the probe; on hosts
    # where `from google.protobuf import runtime_version` already works
    # the function short-circuits to "" and this test cannot exercise
    # the candidate scan — skip there rather than fake out the import
    try:
        from google.protobuf import runtime_version  # noqa: F401

        import pytest

        pytest.skip("native protobuf present: candidate scan unreachable")
    except ImportError:
        pass
    assert pbcompat.find_protobuf_runtime() is None


def test_shim_replaces_a_planted_regular_file(tmp_path, monkeypatch):
    """A regular FILE planted at google/protobuf (rmtree raises on files
    and ignore_errors swallows it) must not survive: either it is
    removed and relinked, or the shim root is abandoned for a fresh one
    whose entry IS the symlink (r10 review finding #1)."""
    monkeypatch.setattr(pbcompat, "_SHIM_ROOT", str(tmp_path / "shim"))
    rt = _fake_runtime(tmp_path)
    planted = tmp_path / "shim" / "google" / "protobuf"
    planted.parent.mkdir(parents=True)
    planted.write_text("not a symlink")
    shim = pbcompat._shim_dir(rt)
    link = os.path.join(shim, "google", "protobuf")
    assert os.path.islink(link)
    assert os.readlink(link) == os.path.join(rt, "google", "protobuf")


def test_shim_abandons_an_unremovable_entry(tmp_path, monkeypatch):
    """If the planted entry cannot be removed at all, _shim_dir must
    return a DIFFERENT root with a working symlink rather than the
    poisoned one (the docstring's 'abandoned rather than imported')."""
    monkeypatch.setattr(pbcompat, "_SHIM_ROOT", str(tmp_path / "shim"))
    rt = _fake_runtime(tmp_path)
    planted = tmp_path / "shim" / "google" / "protobuf"
    planted.parent.mkdir(parents=True)
    planted.write_text("not a symlink")
    import shutil as _sh

    monkeypatch.setattr(_sh, "rmtree", lambda *a, **k: None)
    monkeypatch.setattr(os, "unlink", _raise_oserror)
    shim = pbcompat._shim_dir(rt)
    assert shim != str(tmp_path / "shim")
    link = os.path.join(shim, "google", "protobuf")
    assert os.path.islink(link)
    assert os.readlink(link) == os.path.join(rt, "google", "protobuf")


def _raise_oserror(*a, **k):
    raise OSError("unremovable")
