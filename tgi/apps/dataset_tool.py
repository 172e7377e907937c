"""Dataset preparation CLI: image folders -> training zip.

Behavioral parity target: dataset_tool.py (folder/zip -> zip with
dataset.json labels, center-crop/scale transforms).
"""

from __future__ import annotations

import io
import json
import os
import zipfile

import click
import numpy as np
from PIL import Image


def transform_image(img: Image.Image, resolution: int | None,
                    transform: str | None):
    if transform == "center-crop":
        s = min(img.size)
        left = (img.size[0] - s) // 2
        top = (img.size[1] - s) // 2
        img = img.crop((left, top, left + s, top + s))
    elif transform == "center-crop-wide":
        w, h = img.size
        s = min(w, h * 4 // 3)
        img = img.crop(((w - s) // 2, 0, (w + s) // 2, h))
    if resolution:
        img = img.resize((resolution, resolution), Image.LANCZOS)
    return img


@click.command()
@click.option("--source", required=True)
@click.option("--dest", required=True, help="output .zip")
@click.option("--resolution", type=int, default=None)
@click.option("--transform", default=None,
              type=click.Choice(["center-crop", "center-crop-wide"]))
@click.option("--labels", "labels_json", default=None,
              help="existing dataset.json to carry over")
def main(source, dest, resolution, transform, labels_json):
    names = sorted(f for f in os.listdir(source)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    label_table = {}
    if labels_json:
        with open(labels_json) as f:
            label_table = dict(json.load(f)["labels"])
    labels = []
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as z:
        for i, name in enumerate(names):
            img = Image.open(os.path.join(source, name)).convert("RGB")
            img = transform_image(img, resolution, transform)
            out_name = f"img{i:08d}.png"
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            z.writestr(out_name, buf.getvalue())
            if name in label_table:
                labels.append([out_name, label_table[name]])
        if labels:
            z.writestr("dataset.json", json.dumps({"labels": labels}))
    click.echo(f"wrote {len(names)} images -> {dest}")


if __name__ == "__main__":
    main()
