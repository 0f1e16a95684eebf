from progressivecodec_tpu.data.datasets import (
    ImageFolderDataset,
    KodakDataset,
    PatchLoader,
    load_image,
)

__all__ = ["ImageFolderDataset", "KodakDataset", "PatchLoader", "load_image"]
