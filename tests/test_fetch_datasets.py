"""Offline tests for the dataset-fetch recipe (tools/fetch_datasets.py).

No network: downloads are replaced by prebuilt archives; what's tested is
everything else the two-command verification recipe depends on — archive
extraction/unwrapping, structure verification, TOFU sha256 pinning, and
mismatch detection.
"""

import json
import os
import sys
import tarfile
import zipfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import fetch_datasets as fd  # noqa: E402


def _make_bedroom_zip(path):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("bedroom/image/000001.jpg", b"jpegdata")
        z.writestr("bedroom/depth/000001.png", b"pngdata")
        z.writestr(
            "bedroom/bedroom.log",
            "0 0 1\n1 0 0 0\n0 1 0 0\n0 0 1 0\n0 0 0 1\n",
        )


def _make_tum_tgz(path, tmp_path):
    src = tmp_path / "rgbd_dataset_freiburg1_desk"
    (src / "rgb").mkdir(parents=True)
    (src / "depth").mkdir()
    (src / "rgb" / "1.png").write_bytes(b"x")
    (src / "depth" / "1.png").write_bytes(b"x")
    for f in ("rgb.txt", "depth.txt", "groundtruth.txt"):
        (src / f).write_text("# header\n")
    with tarfile.open(path, "w:gz") as t:
        t.add(src, arcname="rgbd_dataset_freiburg1_desk")


def test_extract_verify_and_pin(tmp_path, monkeypatch):
    monkeypatch.setattr(fd, "CHECKSUM_FILE", str(tmp_path / "sums.json"))
    archive = tmp_path / "bedroom.zip"
    _make_bedroom_zip(archive)

    dest = tmp_path / "data" / "indoor_lidar" / "bedroom"
    fd.check_integrity("bedroom", str(archive))  # first: records
    fd.extract(str(archive), str(dest))
    fd.verify_structure(str(dest), fd.DATASETS["bedroom"]["structure"])
    assert (dest / "bedroom.log").exists()  # top-level dir unwrapped

    # Pin round-trips; tampering is detected.
    fd.check_integrity("bedroom", str(archive))
    pins = json.load(open(tmp_path / "sums.json"))
    assert pins["bedroom"] == fd.sha256_of(str(archive))
    archive.write_bytes(archive.read_bytes() + b"!")
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        fd.check_integrity("bedroom", str(archive))


def test_tum_tgz_extract_and_structure(tmp_path):
    archive = tmp_path / "fr1desk.tgz"
    _make_tum_tgz(archive, tmp_path)
    dest = tmp_path / "data" / "tum" / "rgbd_dataset_freiburg1_desk"
    fd.extract(str(archive), str(dest))
    fd.verify_structure(str(dest), fd.DATASETS["tum_fr1_desk"]["structure"])


def test_structure_rejects_incomplete(tmp_path):
    dest = tmp_path / "broken"
    (dest / "image").mkdir(parents=True)  # empty dirs / missing files
    (dest / "depth").mkdir()
    with pytest.raises(RuntimeError, match="non-empty"):
        fd.verify_structure(str(dest), fd.DATASETS["bedroom"]["structure"])


def test_main_uses_local_archive_without_network(tmp_path, monkeypatch):
    """End-to-end main(): with the archive already present, no download is
    attempted and the dataset lands verified in --dir."""
    monkeypatch.setattr(fd, "CHECKSUM_FILE", str(tmp_path / "sums.json"))
    data_dir = tmp_path / "datasets"
    data_dir.mkdir()
    _make_bedroom_zip(data_dir / "bedroom.zip")

    def no_download(*a, **k):
        raise AssertionError("network should not be touched")

    monkeypatch.setattr(fd, "download", no_download)
    assert fd.main(["bedroom", "--dir", str(data_dir)]) == 0
    fd.verify_structure(
        str(data_dir / "indoor_lidar" / "bedroom"),
        fd.DATASETS["bedroom"]["structure"],
    )
    # Second run: present + verified, still no network.
    assert fd.main(["bedroom", "--dir", str(data_dir)]) == 0
