"""Cross-cutting constants shared across the pipeline.

Mirrors reference src/mpcg_wav2vec/config.py:9-31 (sample rates, segmentation windows) but is
framework-agnostic: instead of a torch device choice, device placement is handled by
``parallel.mesh`` (JAX meshes / shardings).
"""

from __future__ import annotations

from .signal.segment import WindowSpec

# Classification sample rates (paper grid-search optima; reference config.py:9-12).
CLASSIFY_FS_CINC = 16000
CLASSIFY_FS_DEFAULT = 4125

# Diffusion-generator operating rate (reference config.py:14).
GENERATIVE_FS = 4000

# Per-dataset segmentation windows: 0.25 s overlap, 0.3 s start pad throughout
# (reference config.py:17-21).
WINDOWS = {
    "cinc": WindowSpec(window_s=4.0),
    "training-a": WindowSpec(window_s=4.0),
    "vest": WindowSpec(window_s=2.0),
}


def default_window(dataset: str) -> WindowSpec:
    return WINDOWS.get(dataset, WindowSpec(window_s=4.0))
