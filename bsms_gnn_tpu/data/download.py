"""DeepMind MeshGraphNets dataset downloader.

Parity with reference `misc/download_tfrecord.py` + `misc/download_dataset.sh`:
fetches meta.json and the train/valid/test tfrecords from
storage.googleapis.com/dm-meshgraphnets/<name>/ into
`{tf_dataset_dir}/{name}/` using urllib (no wget dependency).

Usage:
    python -m bsms_gnn_tpu.data.download datasets=airfoil
"""

from __future__ import annotations

import os
import sys
import urllib.request

BASE_URL = "https://storage.googleapis.com/dm-meshgraphnets"
FILES = ("meta.json", "train.tfrecord", "valid.tfrecord", "test.tfrecord")


def download_dataset(name: str, output_dir: str) -> None:
    target = os.path.join(output_dir, name)
    os.makedirs(target, exist_ok=True)
    for fname in FILES:
        url = f"{BASE_URL}/{name}/{fname}"
        dst = os.path.join(target, fname)
        if os.path.exists(dst):
            print(f"exists, skip {dst}", flush=True)
            continue
        print(f"downloading {url} → {dst}", flush=True)
        tmp = dst + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dst)


def main() -> None:
    from bsms_gnn_tpu.config import load_config

    cfg = load_config(sys.argv[1:])
    download_dataset(cfg.datasets.name, cfg.datasets.tf_dataset_dir)


if __name__ == "__main__":
    main()
