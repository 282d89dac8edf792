"""Fetch the two published-baseline datasets and verify the BASELINE gates.

The reference's only published accuracy anchor is bedroom-20 (IndoorLidar
"bedroom", frames 0..20, bilateral ON, MsIcpParams defaults -> mean
trajectory error angle 1.91 deg / translation 0.03885, reference
README.md:115-117); TUM fr1/desk is the second named end-to-end workload
(BASELINE config 2). Neither dataset is redistributable inside this repo,
so this script downloads them from their official hosts:

    python tools/fetch_datasets.py bedroom tum_fr1_desk

then the two gates run in two commands:

    python -m align3d_tpu.cli odometry ilrgbd datasets/indoor_lidar/bedroom 20
    python -m align3d_tpu.cli odometry tum datasets/tum/rgbd_dataset_freiburg1_desk 40

or as a pytest (skipped unless the data is present):

    ALIGN3D_DATASETS_DIR=datasets python -m pytest tests/test_published_gates.py -v

Integrity: a sha256 is recorded into tools/dataset_checksums.json on first
download (trust-on-first-use; the hosts publish no checksums) and verified
on every later download. Structure is always verified post-extraction.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tarfile
import urllib.request
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
CHECKSUM_FILE = os.path.join(HERE, "dataset_checksums.json")

DATASETS = {
    "bedroom": {
        # Indoor LiDAR-RGBD Scan Dataset (Park et al., "Colored Point Cloud
        # Registration Revisited", ICCV 2017), landing page
        # http://redwood-data.org/indoor_lidar_rgbd/ . The reference's
        # IndoorLidarDataset::load consumes the extracted layout directly
        # (src/io/dataset/indoor_lidar.rs:34-77).
        "urls": [
            "http://redwood-data.org/indoor_lidar_rgbd/data/bedroom.zip",
            "https://github.com/isl-org/open3d_downloads/releases/download/redwood/bedroom.zip",
        ],
        "archive": "bedroom.zip",
        "dest": "indoor_lidar/bedroom",
        "structure": {
            "dirs": ["image", "depth"],
            "files": ["bedroom.log"],
        },
    },
    "tum_fr1_desk": {
        # TUM RGB-D benchmark (Sturm et al., IROS 2012), landing page
        # https://cvg.cit.tum.de/data/datasets/rgbd-dataset/download .
        "urls": [
            "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz",
            "https://vision.in.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz",
        ],
        "archive": "rgbd_dataset_freiburg1_desk.tgz",
        "dest": "tum/rgbd_dataset_freiburg1_desk",
        "structure": {
            "dirs": ["rgb", "depth"],
            "files": ["rgb.txt", "depth.txt", "groundtruth.txt"],
        },
    },
}


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(urls: list[str], out_path: str) -> None:
    last_err: Exception | None = None
    for url in urls:
        try:
            log(f"downloading {url} ...")
            with urllib.request.urlopen(url, timeout=60) as resp, open(
                out_path, "wb"
            ) as f:
                shutil.copyfileobj(resp, f)
            return
        except Exception as e:  # noqa: BLE001 - try the mirror
            last_err = e
            log(f"  failed: {e}")
    raise RuntimeError(f"all mirrors failed for {out_path}: {last_err}")


def check_integrity(name: str, archive_path: str) -> None:
    digest = sha256_of(archive_path)
    recorded = {}
    if os.path.exists(CHECKSUM_FILE):
        with open(CHECKSUM_FILE) as f:
            recorded = json.load(f)
    if name in recorded:
        if recorded[name] != digest:
            raise RuntimeError(
                f"sha256 mismatch for {name}: expected {recorded[name]}, "
                f"got {digest} — delete {CHECKSUM_FILE} to re-pin"
            )
        log(f"sha256 verified: {digest}")
    else:
        recorded[name] = digest
        with open(CHECKSUM_FILE, "w") as f:
            json.dump(recorded, f, indent=2, sort_keys=True)
        log(f"sha256 recorded (first download): {digest}")


def extract(archive_path: str, dest_dir: str) -> None:
    tmp = dest_dir + ".extract"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    if archive_path.endswith(".zip"):
        with zipfile.ZipFile(archive_path) as z:
            z.extractall(tmp)
    else:
        with tarfile.open(archive_path) as t:
            t.extractall(tmp, filter="data")
    # Archives typically wrap everything in one top-level directory; unwrap.
    entries = os.listdir(tmp)
    src = (
        os.path.join(tmp, entries[0])
        if len(entries) == 1 and os.path.isdir(os.path.join(tmp, entries[0]))
        else tmp
    )
    shutil.rmtree(dest_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(dest_dir), exist_ok=True)
    shutil.move(src, dest_dir)
    shutil.rmtree(tmp, ignore_errors=True)


def verify_structure(dest_dir: str, structure: dict) -> None:
    for d in structure["dirs"]:
        p = os.path.join(dest_dir, d)
        if not os.path.isdir(p) or not os.listdir(p):
            raise RuntimeError(f"expected non-empty directory {p}")
    for fname in structure["files"]:
        p = os.path.join(dest_dir, fname)
        if not os.path.isfile(p):
            raise RuntimeError(f"expected file {p}")
    log(f"structure verified: {dest_dir}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument(
        "names",
        nargs="*",
        help=f"datasets to fetch: {', '.join(DATASETS)} (default: all)",
    )
    parser.add_argument(
        "--dir",
        default=os.environ.get("ALIGN3D_DATASETS_DIR", "datasets"),
        help="destination root (default: ./datasets or $ALIGN3D_DATASETS_DIR)",
    )
    parser.add_argument(
        "--url", help="override the download URL (single dataset only)"
    )
    args = parser.parse_args(argv)
    names = args.names or list(DATASETS)
    unknown = [n for n in names if n not in DATASETS]
    if unknown:
        parser.error(f"unknown dataset(s) {unknown}; choose from {list(DATASETS)}")
    if args.url and len(names) != 1:
        parser.error("--url requires exactly one dataset name")

    for name in names:
        spec = DATASETS[name]
        dest = os.path.join(args.dir, spec["dest"])
        if os.path.isdir(dest):
            try:
                verify_structure(dest, spec["structure"])
                log(f"{name}: already present at {dest}")
                continue
            except RuntimeError:
                log(f"{name}: present but incomplete; re-fetching")
        os.makedirs(args.dir, exist_ok=True)
        archive = os.path.join(args.dir, spec["archive"])
        if not os.path.exists(archive):
            download([args.url] if args.url else spec["urls"], archive)
        check_integrity(name, archive)
        extract(archive, dest)
        verify_structure(dest, spec["structure"])
        log(f"{name}: ready at {dest}")

    log("\nverify the published gates with:")
    log(
        f"  python -m align3d_tpu.cli odometry ilrgbd "
        f"{os.path.join(args.dir, 'indoor_lidar/bedroom')} 20"
    )
    log(
        f"  python -m align3d_tpu.cli odometry tum "
        f"{os.path.join(args.dir, 'tum/rgbd_dataset_freiburg1_desk')} 40"
    )
    log(
        f"  ALIGN3D_DATASETS_DIR={args.dir} python -m pytest "
        f"tests/test_published_gates.py -v"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
