"""OpenImages downloader — parity with the reference's dataset bootstrap.

Behavioral spec: /root/reference/src/downloader_openimages.py:4-19 (fiftyone
zoo, 300k train / 10k test, exported to the `root/split/data` layout that
ImageFolderDataset consumes).  fiftyone is not part of this environment's
baked dependencies, so the import is lazy and the error actionable; in
zero-egress sandboxes use data.datasets.NaturalSyntheticDataset instead.
"""

from __future__ import annotations

import os


def download_openimages(
    root: str,
    n_train: int = 300_000,
    n_test: int = 10_000,
    seed: int = 51,
) -> None:
    """Download OpenImages-v6 train/test splits into the reference layout:

        root/train/data/*.jpg
        root/test/data/*.jpg

    Requires the optional `fiftyone` package (the reference's tool of
    choice) and network egress.
    """
    try:
        import fiftyone.zoo as foz
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "download_openimages needs the optional 'fiftyone' package "
            "(pip install fiftyone) and network access; in offline "
            "environments use data.datasets.NaturalSyntheticDataset or "
            "point --train-dir at an existing root/split/data layout"
        ) from e

    for split, n in (("train", n_train), ("test", n_test)):
        ds = foz.load_zoo_dataset(
            "open-images-v6",
            split="validation" if split == "test" else split,
            max_samples=n,
            seed=seed,
            shuffle=True,
        )
        out = os.path.join(root, split, "data")
        os.makedirs(out, exist_ok=True)
        ds.export(export_dir=out, dataset_type="image-directory")
