"""Observability: scalar/image logging — reference visualizer parity
(``engineer/visualizer/wandb_visualizer.py`` + base class): scalars and
images per optimization step, with a local JSONL/PNG backend always on
and wandb used when available+configured (the reference hard-requires
wandb)."""

from __future__ import annotations

import json
import os
import os.path as osp
import time

import numpy as np


class BaseVisualizer:
    def add_scalar(self, tag, value, step):
        raise NotImplementedError

    def add_image(self, tag, img, step):
        raise NotImplementedError


class LocalVisualizer(BaseVisualizer):
    """Scalars → <dir>/scalars.jsonl; images → <dir>/imgs/<tag>_<step>.png."""

    def __init__(self, log_dir: str):
        self.dir = log_dir
        os.makedirs(osp.join(log_dir, "imgs"), exist_ok=True)
        self._f = open(osp.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({"t": time.time(), "step": int(step),
                                  "tag": tag, "value": float(value)}) + "\n")
        self._f.flush()

    def add_scalars(self, scalars: dict, step):
        for k, v in scalars.items():
            if isinstance(v, (int, float)) and np.isfinite(v):
                self.add_scalar(k, v, step)

    def add_image(self, tag, img, step):
        import cv2

        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = np.clip((img + 1) / 2 if img.min() < 0 else img, 0, 1)
            img = (img * 255).astype(np.uint8)
        if img.ndim == 3 and img.shape[-1] == 3:
            img = img[:, :, ::-1]  # RGB → BGR for cv2
        safe = tag.replace("/", "_")
        cv2.imwrite(osp.join(self.dir, "imgs", f"{safe}_{int(step):06d}.png"), img)


class WandbVisualizer(BaseVisualizer):
    """wandb backend (reference wandb_visualizer parity); degrades to the
    local backend when wandb is unavailable or offline init fails."""

    def __init__(self, project: str, name: str, log_dir: str):
        self.local = LocalVisualizer(log_dir)
        self.wandb = None
        try:
            import wandb

            wandb.init(project=project, name=name, dir=log_dir)
            self.wandb = wandb
        except Exception:
            self.wandb = None

    def add_scalar(self, tag, value, step):
        self.local.add_scalar(tag, value, step)
        if self.wandb:
            self.wandb.log({tag: value}, step=int(step))

    def add_scalars(self, scalars, step):
        self.local.add_scalars(scalars, step)
        if self.wandb:
            self.wandb.log({k: v for k, v in scalars.items()}, step=int(step))

    def add_image(self, tag, img, step):
        self.local.add_image(tag, img, step)
        if self.wandb:
            self.wandb.log({tag: self.wandb.Image(np.asarray(img))}, step=int(step))


def get_visualizer(log_dir: str, project: str = "recmv_tpu", name: str = "run",
                   use_wandb: bool = False) -> BaseVisualizer:
    if use_wandb:
        return WandbVisualizer(project, name, log_dir)
    return LocalVisualizer(log_dir)
