"""Host-side image helpers: prompt panel rendering and result strips.

Parity: /root/reference/utils/utils.py:137-155 (txt_draw) and the 4-panel
output contract [instruction | ground truth | reconstruction | edit]
(/root/reference/models/p2p_editor.py:197).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
from PIL import Image


def txt_draw(text: str, target_size=(512, 512)) -> np.ndarray:
    """Render text into an RGB uint8 image (the first panel of each strip)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    fig = plt.figure(dpi=300, figsize=(1, 1))
    plt.text(-0.1, 1.1, text, fontsize=3.5, wrap=True,
             verticalalignment="top", horizontalalignment="left")
    plt.axis("off")
    canvas = FigureCanvasAgg(fig)
    canvas.draw()
    w, h = canvas.get_width_height()
    buf = np.frombuffer(canvas.buffer_rgba(), dtype=np.uint8).reshape(h, w, 4)
    image = Image.fromarray(buf[:, :, :3])
    image = image.resize(target_size, Image.LANCZOS)
    plt.close(fig)
    return np.asarray(image)


def make_strip(panels: Sequence[np.ndarray]) -> Image.Image:
    """Horizontally concatenate equal-height panels into one PIL image."""
    return Image.fromarray(np.concatenate([np.asarray(p) for p in panels], axis=1))
