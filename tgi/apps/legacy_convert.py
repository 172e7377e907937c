"""Convert a reference network pickle into a native tgi checkpoint.

Behavioral parity target: legacy.py:295-318 (convert_network_pickle CLI).
Two input tiers, both handled in one command:

- **TF-era pickles** ((G, D, Gs) tflib tuple): re-expressed as tgi's
  standalone 2D StyleGAN2 family via ``tgi.io.legacy_tf`` — the same
  variable mapping the reference applies in convert_tf_generator /
  convert_tf_discriminator (legacy.py:109-291).
- **Modern pickles** (persistence dicts with G/D/G_ema): imported with the
  code-free unpickler and renamed into tgi pytrees; ``--force-fp16``
  mirrors legacy.py:48-60 (in tgi a config rewrite, no weight copying).

Output is a plain-data msgpack checkpoint (tgi.io.checkpoints) — the
architecture lives in the stored configs, never in embedded source.
"""

from __future__ import annotations

import dataclasses

import click

from tgi.io import load_network_pkl, save_checkpoint
from tgi.io.legacy_tf import ConvertedSG2


def convert_pickle(source: str, dest: str, force_fp16: bool = False) -> dict:
    """Convert ``source`` (reference pickle) to a tgi checkpoint at
    ``dest``. Returns {name: kind} for the converted networks."""
    data = load_network_pkl(source)
    params, configs, kinds = {}, {}, {}
    for name in ("G", "D", "G_ema"):
        net = data.get(name)
        if net is None:
            continue
        if isinstance(net, ConvertedSG2):
            cfg = net.config
            if force_fp16 and net.kind == "generator":
                cfg = dataclasses.replace(cfg, num_fp16_res=4,
                                          conv_clamp=256,
                                          fused_dtype="bfloat16")
            params[name] = net.params
            configs[name] = {"kind": f"sg2_{net.kind}",
                             **dataclasses.asdict(cfg)}
            kinds[name] = f"sg2_{net.kind}"
        else:
            from tgi.io import (captured_state_dict, convert_generator_params,
                                generator_config_from_captured)
            if name == "D":
                continue  # EG3D D import is handled by train-resume paths
            cfg = generator_config_from_captured(net)
            if force_fp16:
                cfg = dataclasses.replace(cfg, fused_dtype="bfloat16",
                                          sr_num_fp16_res=4)
            params[name] = convert_generator_params(captured_state_dict(net))
            cfg_dict = dataclasses.asdict(cfg)
            cfg_dict.pop("sr_cfg", None)
            configs[name] = {"kind": "triplane_generator", **cfg_dict}
            kinds[name] = "triplane_generator"
    save_checkpoint(dest, params, config=configs,
                    metadata={"source": str(source)})
    return kinds


@click.command()
@click.option("--source", required=True, metavar="PATH",
              help="Input reference pickle (TF-era or modern)")
@click.option("--dest", required=True, metavar="PATH",
              help="Output tgi checkpoint")
@click.option("--force-fp16", type=bool, default=False, show_default=True,
              help="Force mixed precision (bf16 on TPU)")
def main(source, dest, force_fp16):
    # Pure data tool: never touch an accelerator (the structural
    # validation's eval_shape only needs a host backend).
    import jax

    jax.config.update("jax_platforms", "cpu")
    click.echo(f'Loading "{source}"...')
    kinds = convert_pickle(source, dest, force_fp16=force_fp16)
    for name, kind in kinds.items():
        click.echo(f"  {name}: {kind}")
    click.echo(f'Saved "{dest}".')


if __name__ == "__main__":
    main()
