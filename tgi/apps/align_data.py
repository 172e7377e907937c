"""Face-alignment CLI: raw images + landmark sidecar -> FFHQ-aligned crops.

Behavioral parity target: utils/align_data.py (reference entry point).
The reference detects 68-point landmarks with dlib, which is not
available in this image; landmarks are supplied as a sidecar instead —
``{filename: [[x, y] * 68]}`` as .json or pickled-dict .npy — and the
FFHQ quad/warp recipe (utils/alignment.py:9-114) is applied verbatim by
``tgi.utils.alignment``. Any detector (dlib, mediapipe, face-alignment)
run offline can produce the sidecar.

Run: python -m tgi.apps.align_data --src raw/ --dst aligned/ \
         --landmarks lm.json --size 1024
"""

from __future__ import annotations

import click


@click.command()
@click.option("--src", "src_dir", required=True, help="raw image dir")
@click.option("--dst", "dst_dir", required=True, help="output dir")
@click.option("--landmarks", "landmarks_path", required=True,
              help="{filename: 68x2} .json or .npy sidecar")
@click.option("--size", "output_size", default=1024)
def main(src_dir, dst_dir, landmarks_path, output_size):
    from tgi.utils.alignment import align_directory
    done = align_directory(src_dir, dst_dir, landmarks_path,
                           output_size=output_size)
    click.echo(f"aligned {len(done)} images -> {dst_dir}")


if __name__ == "__main__":
    main()
