"""Checkpoint migration CLI: reference torch ``.pth`` <-> our Orbax state.

Import (``--from_torch``): reads the reference's per-network files
``{epoch}_net_{G_A,G_B,D_A,D_B}.pth`` (reference models/base_model.py:89-112
naming) from --torch_dir, maps them onto a freshly initialized CycleGANState
(optimizer moments start at zero, matching the reference's own resume, which
never saves optimizer state — SURVEY §5), and writes ``ckpt_{epoch}`` under
<checkpoints_dir>/<name>/ ready for ``train.py --continue_train`` or
``test.py``.

Export (``--to_torch``): restores ``ckpt_{epoch}`` and writes the four
reference-style ``.pth`` files (with the InstanceNorm running-stats buffers
the reference's strict load requires) into --torch_dir, loadable by the
reference's load_networks (reference models/base_model.py:130-148).

Discriminator files are optional on import (a TestModel-style directory with
only generators still converts; Ds keep their fresh init).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax

from mra_gan_tpu.checkpoint import (
    CheckpointManager,
    load_torch_network,
    save_torch_network,
)
from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    d = p.add_mutually_exclusive_group(required=True)
    d.add_argument("--from_torch", action="store_true",
                   help="reference .pth files -> Orbax checkpoint")
    d.add_argument("--to_torch", action="store_true",
                   help="Orbax checkpoint -> reference .pth files")
    p.add_argument("--torch_dir", required=True,
                   help="directory holding/receiving {epoch}_net_*.pth")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--name", default="experiment_name")
    p.add_argument("--which_epoch", default="latest")
    # network flags (must match how the torch model was defined)
    p.add_argument("--netG", default="resnet_6blocks")
    p.add_argument("--netD", default="n_layers")
    p.add_argument("--n_layers_D", type=int, default=3)
    p.add_argument("--ngf", type=int, default=32)
    p.add_argument("--ndf", type=int, default=32)
    p.add_argument("--input_nc", type=int, default=1)
    p.add_argument("--output_nc", type=int, default=1)
    p.add_argument("--norm", default="instance")
    p.add_argument("--use_dropout", action="store_true",
                   help="the torch nets were built with dropout (shifts the "
                        "resnet block key indices)")
    p.add_argument("--patch_size", type=int, nargs=3, default=[64, 64, 64])
    p.add_argument("--dynet_sizes", type=int, nargs=3, default=[128, 128, 64],
                   help="Dynet auto-schedule sizes (the reference hard-codes "
                        "[128,128,64] independent of patch size)")
    p.add_argument("--dynet_spacings", type=float, nargs=3,
                   default=[1.5, 1.5, 1.5])
    p.add_argument("--pool_size", type=int, default=50,
                   help="replay-buffer size of the training run that will "
                        "resume from the imported checkpoint")
    return p


NET_KEYS = (("G_A", "g_params", "g_a"), ("G_B", "g_params", "g_b"),
            ("D_A", "d_params", "d_a"), ("D_B", "d_params", "d_b"))


def main(argv=None):
    opt = build_parser().parse_args(argv)
    torch_dir = Path(opt.torch_dir)
    cfg = CycleGANConfig(
        input_nc=opt.input_nc, output_nc=opt.output_nc, ngf=opt.ngf,
        ndf=opt.ndf, net_g=opt.netG, net_d=opt.netD,
        n_layers_d=opt.n_layers_D, norm=opt.norm,
        no_dropout=not opt.use_dropout, pool_size=opt.pool_size,
        dynet_sizes=tuple(opt.dynet_sizes),
        dynet_spacings=tuple(opt.dynet_spacings))
    ckpt = CheckpointManager(opt.checkpoints_dir, opt.name)

    def arch(net):
        return opt.netG if net.startswith("G") else opt.netD

    if opt.from_torch:
        state = create_state(cfg, jax.random.PRNGKey(0), tuple(opt.patch_size))
        g_params = dict(state.g_params)
        d_params = dict(state.d_params)
        imported = []
        for net, group, key in NET_KEYS:
            pth = torch_dir / f"{opt.which_epoch}_net_{net}.pth"
            if not pth.exists():
                if net.startswith("G"):
                    raise SystemExit(f"missing generator checkpoint {pth}")
                print(f"note: {pth.name} absent — {net} keeps fresh init")
                continue
            tgt = g_params if group == "g_params" else d_params
            tgt[key] = load_torch_network(pth, tgt[key], arch=arch(net))
            imported.append(net)
        state = state.replace(g_params=g_params, d_params=d_params)
        ckpt.save(opt.which_epoch, state, also_latest=False)
        print(f"imported {imported} -> {ckpt.path(opt.which_epoch)}")
    else:
        tree = ckpt.restore_raw(opt.which_epoch)
        torch_dir.mkdir(parents=True, exist_ok=True)
        for net, group, key in NET_KEYS:
            params = tree[group][key]
            pth = torch_dir / f"{opt.which_epoch}_net_{net}.pth"
            save_torch_network(params, pth, arch=arch(net),
                               use_dropout=opt.use_dropout)
            print(f"wrote {pth}")


if __name__ == "__main__":
    main()
