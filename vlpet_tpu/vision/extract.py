"""Feature pre-extraction tool: raw images → packed grid features.

The reference ships precomputed CLIP grid features as one h5 per image
(seek-heavy; SURVEY.md §7 risk). This tool runs the Flax CLIP encoder in
jitted batches and writes the memory-mapped packed layout
(vlpet_tpu.data.features.PackedFeatureSource) the loaders prefer.

Usage:
    python -m vlpet_tpu.vision.extract --images <dir> --out <prefix> \
        --backbone RN101 --image_size 224 [--clip_ckpt local_clip.pt]
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlpet_tpu.vision.clip import CLIPVisualEncoder


CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(img: np.ndarray, image_size: int) -> np.ndarray:
    """Resize-shorter-side + center-crop + CLIP normalization; img HWC uint8."""
    from PIL import Image

    im = Image.fromarray(img).convert("RGB")
    w, h = im.size
    scale = image_size / min(w, h)
    im = im.resize((max(image_size, int(round(w * scale))),
                    max(image_size, int(round(h * scale)))), Image.BICUBIC)
    w, h = im.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    im = im.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(im, np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def extract_features(image_loader: Callable[[str], np.ndarray],
                     img_ids: List[str], out_prefix: str,
                     backbone: str = "RN101", image_size: int = 224,
                     batch_size: int = 32,
                     clip_variables=None) -> None:
    """Run the encoder over img_ids and write {prefix}.npy + index json."""
    enc = CLIPVisualEncoder(backbone=backbone, image_size=image_size)
    if clip_variables is None:
        dummy = jnp.zeros((1, image_size, image_size, 3))
        clip_variables = enc.init(jax.random.PRNGKey(0), dummy)

    @jax.jit
    def run(imgs):
        grid, pooled = enc.apply(clip_variables, imgs)
        return grid

    feats = None
    index: Dict[str, int] = {}
    for start in range(0, len(img_ids), batch_size):
        ids = img_ids[start:start + batch_size]
        imgs = np.stack([preprocess_image(image_loader(i), image_size)
                         for i in ids])
        pad = batch_size - len(ids)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                                  imgs.dtype)])
        grid = np.asarray(run(jnp.asarray(imgs)))[:len(ids)]
        if feats is None:
            feats = np.empty((len(img_ids),) + grid.shape[1:], np.float32)
        feats[start:start + len(ids)] = grid
        for j, img_id in enumerate(ids):
            index[str(img_id)] = start + j
    np.save(out_prefix + ".npy", feats)
    np.save(out_prefix + "_boxes.npy",
            np.zeros(feats.shape[:2] + (4,), np.float32))
    with open(out_prefix + "_index.json", "w") as f:
        json.dump(index, f)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--backbone", default="RN101")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--clip_ckpt", default=None)
    args = p.parse_args(argv)

    files = sorted(os.listdir(args.images))
    ids = [os.path.splitext(f)[0] for f in files]

    def load(img_id):
        from PIL import Image

        for f in files:
            if os.path.splitext(f)[0] == img_id:
                return np.asarray(Image.open(os.path.join(args.images, f)))
        raise KeyError(img_id)

    clip_vars = None
    if args.clip_ckpt:
        import torch

        from vlpet_tpu.vision.clip_import import clip_torch_to_flax

        enc = CLIPVisualEncoder(backbone=args.backbone,
                                image_size=args.image_size)
        dummy = jnp.zeros((1, args.image_size, args.image_size, 3))
        clip_vars = enc.init(jax.random.PRNGKey(0), dummy)
        sd = torch.load(args.clip_ckpt, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        clip_vars, report = clip_torch_to_flax(sd, clip_vars)
        print(f"loaded {len(report['filled'])} CLIP tensors")
    extract_features(load, ids, args.out, args.backbone, args.image_size,
                     args.batch_size, clip_vars)
    print(f"wrote {args.out}.npy for {len(ids)} images")


if __name__ == "__main__":
    main()
