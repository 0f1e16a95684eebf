"""Input pipeline: image folders, random-crop patch loader, host sharding.

Behavioral spec: /root/reference/src/compress/datasets/utils.py:11-74
(OpenImages `root/split/data` layout capped at num_images; Kodak dir of
images).  TPU-first: per-host file sharding (each host reads a disjoint
stripe — pod-ready), background prefetch threads, NHWC float32 batches.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Sequence

import numpy as np

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")


def load_image(path: str) -> np.ndarray:
    """RGB float32 HWC in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def _list_images(root: str) -> list[str]:
    files = sorted(
        os.path.join(root, f) for f in os.listdir(root) if f.lower().endswith(_EXTS)
    )
    return files


class ImageFolderDataset:
    """`root/split/data` file list, capped, sharded across hosts.

    Sharding: host h of H takes files[h::H] — disjoint stripes so a pod
    never reads a sample twice per epoch (replaces the reference's single-
    process DataLoader, train.py:209-233).
    """

    def __init__(
        self,
        root: str,
        split: str = "train",
        num_images: int | None = None,
        host_index: int = 0,
        host_count: int = 1,
    ):
        base = os.path.join(root, split, "data")
        if not os.path.isdir(base):
            base = os.path.join(root, split)
        if not os.path.isdir(base):
            base = root
        files = _list_images(base)
        if num_images:
            files = files[:num_images]
        self.files = files[host_index::host_count]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> np.ndarray:
        return load_image(self.files[i])


class KodakDataset(ImageFolderDataset):
    def __init__(self, root: str):
        super().__init__(root, split="")
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")


def random_crop(img: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    h, w = img.shape[:2]
    if h < size or w < size:
        # reflect-pad small images up to the patch size
        img = np.pad(
            img,
            ((0, max(0, size - h)), (0, max(0, size - w)), (0, 0)),
            mode="reflect",
        )
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img[top : top + size, left : left + size]


class PatchLoader:
    """Random-crop batch iterator with background prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        patch_size: int,
        seed: int = 0,
        prefetch: int = 4,
        workers: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.seed = seed
        self.prefetch = prefetch
        self.workers = workers

    def epoch(self, epoch_idx: int = 0) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self.seed + epoch_idx)
        order = rng.permutation(len(self.dataset))
        n_batches = len(order) // self.batch_size
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        batch_ids = [
            order[b * self.batch_size : (b + 1) * self.batch_size]
            for b in range(n_batches)
        ]
        task_q: queue.Queue = queue.Queue()
        for b, ids in enumerate(batch_ids):
            task_q.put((b, ids))
        results: dict[int, np.ndarray] = {}
        results_lock = threading.Lock()

        def worker(wid: int):
            wrng = np.random.default_rng(self.seed * 7919 + epoch_idx * 131 + wid)
            while True:
                try:
                    b, ids = task_q.get_nowait()
                except queue.Empty:
                    return
                batch = np.stack(
                    [
                        random_crop(self.dataset[int(i)], self.patch_size, wrng)
                        for i in ids
                    ]
                )
                with results_lock:
                    results[b] = batch

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.workers)
        ]
        for t in threads:
            t.start()
        served = 0
        while served < n_batches:
            with results_lock:
                ready = served in results
            if ready:
                with results_lock:
                    yield results.pop(served)
                served += 1
            else:
                threading.Event().wait(0.005)
        for t in threads:
            t.join()


class ImportanceMapDataset:
    """Pairs (image, gradient importance map) for MaskEstractor training.

    Behavioral spec: MaskImageFolder / MaskTestKodakDataset
    (/root/reference/src/compress/datasets/utils.py:81-230, 236-346) run
    the codec + backprop inside __getitem__; here the map comes from the
    jitted layers.importance.importance_map (one grad, no Variable
    machinery) and is computed lazily per image.
    """

    def __init__(self, base_dataset, model, variables, scale_table, patch_size: int = 256, seed: int = 0):
        self.base = base_dataset
        self.model = model
        self.variables = variables
        self.scale_table = scale_table
        self.patch_size = patch_size
        self.seed = seed

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int):
        import jax
        import jax.numpy as jnp

        from progressivecodec_tpu.layers.importance import importance_map
        from progressivecodec_tpu.ops.conv import pad_image

        img = self.base[i]
        rng = np.random.default_rng(self.seed + i)
        patch = random_crop(img, self.patch_size, rng)
        x = jnp.asarray(patch, jnp.float32)[None]
        x_pad, _ = pad_image(x, 64)
        imap = importance_map(
            self.model, self.variables, x_pad, jax.random.PRNGKey(self.seed + i),
            self.scale_table,
        )
        return patch, np.asarray(imap[0])


def _pink_field(rng: np.random.Generator, h: int, w: int, alpha: float) -> np.ndarray:
    """(h, w, 3) correlated 1/f^alpha random field, zero-mean ~unit-std."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    radius = np.sqrt(fy * fy + fx * fx)
    radius[0, 0] = 1.0
    filt = radius ** (-alpha)
    filt[0, 0] = 0.0
    spec = rng.standard_normal((h, w // 2 + 1, 3)) + 1j * rng.standard_normal(
        (h, w // 2 + 1, 3)
    )
    field = np.fft.irfft2(spec * filt[..., None], s=(h, w), axes=(0, 1))
    field /= field.std(axis=(0, 1), keepdims=True) + 1e-8
    # correlate RGB toward a shared luminance direction (natural images
    # have strongly correlated channels)
    mix = 0.75 * np.ones((3, 3)) / 3.0 + 0.25 * np.eye(3)
    return field @ mix.astype(field.dtype)


class NaturalSyntheticDataset:
    """Deterministic synthetic images with natural-image statistics.

    Substitutes for OpenImages in the zero-egress sandbox: 1/f power
    spectrum (smooth + textured regions), anti-aliased geometric
    occluders (sharp edges), and a global illumination gradient — the
    content classes a learned codec's variance-aware mask discriminates.
    Each index is generated independently from its seed, so the dataset
    is reproducible and never stored on disk.
    """

    def __init__(self, n: int = 4000, size: int = 384, seed: int = 0, cache: bool = True):
        self.n = n
        self.size = size
        self.seed = seed
        # generation is ~130ms/image; cache uint8 (size^2*3 bytes each) so
        # epochs beyond the first are IO-free (dict writes are GIL-atomic)
        self._cache: dict[int, np.ndarray] | None = {} if cache else None

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> np.ndarray:
        if self._cache is not None and i in self._cache:
            return self._cache[i].astype(np.float32) / 255.0
        img = self.generate(np.random.default_rng(self.seed * 100003 + i), self.size, self.size)
        if self._cache is not None:
            self._cache[i] = (img * 255.0 + 0.5).astype(np.uint8)
        return img

    @staticmethod
    def generate(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
        alpha = rng.uniform(0.9, 1.7)
        img = 0.22 * _pink_field(rng, h, w, alpha)
        # fine texture layer in random regions
        tex = 0.06 * _pink_field(rng, h, w, 0.4)
        tex_gate = _pink_field(rng, h, w, 2.2)[..., :1]
        img += tex * (tex_gate > 0.3)
        # global illumination gradient
        yy = np.linspace(-1, 1, h)[:, None, None]
        xx = np.linspace(-1, 1, w)[None, :, None]
        g = rng.uniform(-0.15, 0.15, size=(2, 1))
        img += g[0] * yy + g[1] * xx
        # anti-aliased geometric occluders (sharp edges, flat/gradient fill)
        for _ in range(int(rng.integers(2, 6))):
            cy, cx = rng.uniform(0.1, 0.9) * h, rng.uniform(0.1, 0.9) * w
            ry, rx = rng.uniform(0.05, 0.35) * h, rng.uniform(0.05, 0.35) * w
            theta = rng.uniform(0, np.pi)
            dy, dx = (yy[..., 0] * h / 2 + h / 2 - cy), (xx[:, :, 0] * w / 2 + w / 2 - cx)
            u = dy * np.cos(theta) + dx * np.sin(theta)
            v = -dy * np.sin(theta) + dx * np.cos(theta)
            if rng.random() < 0.5:  # ellipse
                d = np.sqrt((u / ry) ** 2 + (v / rx) ** 2) - 1.0
            else:  # rotated rectangle
                d = np.maximum(np.abs(u) / ry, np.abs(v) / rx) - 1.0
            cover = np.clip(0.5 - d * 8.0, 0.0, 1.0)[..., None]
            color = rng.uniform(-0.4, 0.4, size=(3,))
            grad = rng.uniform(-0.1, 0.1) * (u / max(ry, 1.0))[..., None]
            img = img * (1 - 0.85 * cover) + (color + grad) * cover * 0.85
        img += rng.uniform(0.3, 0.7)  # brightness
        return np.clip(img, 0.0, 1.0).astype(np.float32)


class SyntheticKodak:
    """A fixed 24-image 768x512 synthetic test set (Kodak geometry) for
    RD evaluation when the real Kodak set is not on disk."""

    def __init__(self, n: int = 24, seed: int = 77):
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 9176 + i)
        return NaturalSyntheticDataset.generate(rng, 512, 768)


class SyntheticDataset:
    """Deterministic random images — lets training/benchmarks run in
    environments without a dataset on disk."""

    def __init__(self, n: int = 64, size: int = 512, seed: int = 0):
        self.n = n
        self.size = size
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + i)
        # smooth random field: low-frequency content compresses sanely
        small = rng.random((self.size // 8, self.size // 8, 3)).astype(np.float32)
        img = np.kron(small, np.ones((8, 8, 1), np.float32))
        img += 0.05 * rng.standard_normal(img.shape).astype(np.float32)
        return np.clip(img, 0.0, 1.0)
