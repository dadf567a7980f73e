"""Dataset provenance manifests (VERDICT r4 order #8): the demo-data
generator is the ground truth behind every quality number, so its output
must be deterministic per (seed, count, size, style) and pinned by a
content manifest that a regeneration can be checked against."""

import json
import os

from gea.cli.make_demo_data import main as make_demo_data


def _gen(out, extra=()):
    make_demo_data(
        [
            "--out", str(out), "--count", "12", "--size", "48",
            "--seed", "7", "--style", "diverse", *extra,
        ]
    )
    with open(os.path.join(str(out), "MANIFEST.json")) as f:
        return json.load(f)


def test_regeneration_reproduces_manifest_hashes(tmp_path):
    """Same flags -> byte-identical JPEGs: the dump digest and every
    spot-check hash must match across two independent generations."""
    m1 = _gen(tmp_path / "a")
    m2 = _gen(tmp_path / "b")
    assert m1["sha256_dump"] == m2["sha256_dump"]
    assert m1["sha256_spot_check"] == m2["sha256_spot_check"]
    assert m1["count"] == 12
    # The encoder versions that produced the bytes are recorded, so a
    # future hash mismatch is attributable to a library drift.
    for key in ("pillow", "libjpeg", "numpy"):
        assert m1["versions"][key]


def test_manifest_only_matches_generation_manifest(tmp_path):
    """--manifest_only on an existing dump reproduces the generation-time
    digest (the retroactive path used for data/demo10k_320)."""
    m1 = _gen(tmp_path / "a")
    m2 = _gen(tmp_path / "a", extra=["--manifest_only"])
    assert m2["sha256_dump"] == m1["sha256_dump"]


def test_seed_changes_dump(tmp_path):
    make_demo_data(
        ["--out", str(tmp_path / "a"), "--count", "4", "--size", "32",
         "--seed", "1"]
    )
    make_demo_data(
        ["--out", str(tmp_path / "b"), "--count", "4", "--size", "32",
         "--seed", "2"]
    )
    with open(tmp_path / "a" / "MANIFEST.json") as f:
        ma = json.load(f)
    with open(tmp_path / "b" / "MANIFEST.json") as f:
        mb = json.load(f)
    assert ma["sha256_dump"] != mb["sha256_dump"]
