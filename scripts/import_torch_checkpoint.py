"""Import a reference torch checkpoint (.pth) into this framework.

Migration path for users of the torch/CPU reference: point this at a
``model*.pth`` saved by a reference run (sensor_main_module.py:301-304,
trainer_module.py:581/:627/:667 — raw state_dict and both wrapped forms are
accepted) plus that run's ``config.yaml`` dump (load_config.py:193-200), and
it writes an orbax checkpoint holding the converted flax parameter tree and
``ModelState``, ready for fingerprint extraction / identification /
evaluation on TPU without retraining.

Usage:
    python scripts/import_torch_checkpoint.py RUN_DIR/model_final.pth \
        --config RUN_DIR/config.yaml --out runs/imported/ [--verify]

    # architecture can also be given explicitly instead of --config:
    python scripts/import_torch_checkpoint.py model.pth --out runs/imported \
        --image-dim 3 180 180 --z-dim 16 --s-dim 3 --hidden 512 256 \
        --kernels 3 3 5 --strides 2 2 3 --channels 10 10 20

The output loads back with:
    from scripts.import_torch_checkpoint import load_imported
    model, variables, mstate = load_imported("runs/imported")

``--verify`` additionally runs the actual reference VAE (imported from
/root/reference when mounted) and the converted flax model on the same
random inputs and asserts the outputs agree — end-to-end proof on the
user's own checkpoint, not just on the test geometry.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _model_from_config(path):
    """Reference run-dir config.yaml -> CVAE kwargs (the dump holds the
    DERIVED values: image_dim already flipped to (C, H, W) and downsampled,
    hidden_dim with the auto-extra FC layers, s_dim resolved from the state
    string — load_config.py:140-200)."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    c, h, w = [int(v) for v in cfg["image_dim"]]
    cnn = cfg.get("CNNdict") or {}
    return dict(
        img_dim=(h, w, c),
        z_dim=int(cfg["z_dim"]),
        s_dim=int(cfg["s_dim"]),
        hidden_dim=tuple(int(d) for d in cfg["hidden_dim"]),
        cnn_kernels=tuple(int(k) for k in cnn["kernel_size"]),
        cnn_strides=tuple(int(s) for s in cnn["stride"]),
        cnn_channels=tuple(int(ch) for ch in cnn["channels"]),
        y_logvar_dim=int(cfg.get("y_logvar_dim", 1)),
        learn_force=bool(cfg.get("learn_force", False)),
        dx=bool(cfg.get("dx", False)),
    )


def load_imported(out_dir):
    """Load a converted checkpoint back: (CVAE, variables, ModelState)."""
    from ealv_tpu.models import CVAE
    from ealv_tpu.models.cvae import init_model_state
    from ealv_tpu.runtime.checkpoint import load_checkpoint
    import jax
    import jax.numpy as jnp

    with open(os.path.join(out_dir, "model.json")) as f:
        kw = json.load(f)
    for k in ("img_dim", "hidden_dim", "cnn_kernels", "cnn_strides",
              "cnn_channels"):
        kw[k] = tuple(kw[k])
    model = CVAE(**kw)
    example = {
        "variables": model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, model.s_dim)), jnp.zeros((1,) + tuple(model.img_dim)),
            force=jnp.zeros((1, 1)) if model.learn_force else None,
            train=False),
        "mstate": init_model_state(model),
    }
    tree = load_checkpoint(os.path.join(out_dir, "checkpoint"), example)
    return model, tree["variables"], tree["mstate"]


def _verify(sd, model, variables, seed=0):
    """Run the actual torch reference forward vs the converted flax model
    on the user's checkpoint weights (requires /root/reference + torch)."""
    import types

    ref_scripts = "/root/reference/franka_test/scripts"
    if not os.path.isdir(ref_scripts):
        print("[import] --verify skipped: reference not mounted")
        return
    if ref_scripts not in sys.path:
        sys.path.insert(0, ref_scripts)
    np.product = np.prod
    for _missing in ("numa", "faster_fifo", "rospy", "pyqtgraph"):
        sys.modules.setdefault(_missing, types.ModuleType(_missing))
    import torch
    import jax.numpy as jnp

    if model.learn_force:
        from vae.vae_force import VAE as RefVAE
    else:
        from vae.vae import VAE as RefVAE
    h, w, c = model.img_dim
    ref = RefVAE(
        img_dim=(c, h, w), z_dim=model.z_dim, s_dim=model.s_dim,
        hidden_dim=list(model.hidden_dim),
        y_logvar_dim=model.y_logvar_dim,
        CNNdict={"kernel_size": list(model.cnn_kernels),
                 "stride": list(model.cnn_strides),
                 "channels": list(model.cnn_channels)},
        dx=model.dx,
    )
    # strict=False: non-parameter buffers (learning_ind) are irrelevant to
    # the forward comparison and may have been filtered by the caller
    ref.load_state_dict({k: torch.as_tensor(np.asarray(v, np.float32))
                         for k, v in sd.items()}, strict=False)
    ref.eval()

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, model.s_dim)).astype(np.float32)
    y = rng.random((2, c, h, w)).astype(np.float32)
    f = rng.standard_normal((2, 1)).astype(np.float32)
    with torch.no_grad():
        if model.learn_force:
            out_t = ref(torch.tensor(x), torch.tensor(y), torch.tensor(f))
        else:
            out_t = ref(torch.tensor(x), torch.tensor(y))
    out_j = model.apply(variables, jnp.asarray(x),
                        jnp.asarray(y.transpose(0, 2, 3, 1)),
                        force=jnp.asarray(f) if model.learn_force else None,
                        train=False)
    np.testing.assert_allclose(np.asarray(out_j["z_mu"]), out_t[2].numpy(),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["img_pred"]).transpose(0, 3, 1, 2),
        out_t[0].numpy(), rtol=0, atol=1e-3)
    d_img = float(np.abs(np.asarray(out_j["img_pred"]).transpose(0, 3, 1, 2)
                         - out_t[0].numpy()).max())
    d_z = float(np.abs(np.asarray(out_j["z_mu"]) - out_t[2].numpy()).max())
    print(f"[import] verify ok: max|img_pred diff| {d_img:.2e}, "
          f"max|z_mu diff| {d_z:.2e}")


def main():
    ap = argparse.ArgumentParser(
        description="Convert a reference torch .pth to a flax checkpoint")
    ap.add_argument("checkpoint", help="reference model*.pth")
    ap.add_argument("--config", help="reference run config.yaml "
                    "(derives the architecture)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--verify", action="store_true",
                    help="cross-check vs the torch reference forward "
                    "(needs /root/reference mounted)")
    ap.add_argument("--image-dim", type=int, nargs=3, metavar=("C", "H", "W"))
    ap.add_argument("--z-dim", type=int, default=16)
    ap.add_argument("--s-dim", type=int, default=3)
    ap.add_argument("--hidden", type=int, nargs="+", default=[512, 256])
    ap.add_argument("--kernels", type=int, nargs="+", default=[3, 3, 5])
    ap.add_argument("--strides", type=int, nargs="+", default=[2, 2, 3])
    ap.add_argument("--channels", type=int, nargs="+", default=[10, 10, 20])
    ap.add_argument("--y-logvar-dim", type=int, default=1)
    ap.add_argument("--learn-force", action="store_true")
    ap.add_argument("--dx", action="store_true")
    args = ap.parse_args()

    import torch

    from ealv_tpu.models import CVAE
    from ealv_tpu.runtime.checkpoint import save_checkpoint
    from ealv_tpu.utils.torch_import import (convert_state_dict,
                                             unwrap_checkpoint)

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    sd = unwrap_checkpoint(raw)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if not k.endswith("learning_ind")}

    if args.config:
        kw = _model_from_config(args.config)
    else:
        if not args.image_dim:
            ap.error("either --config or --image-dim ... is required")
        c, h, w = args.image_dim
        kw = dict(
            img_dim=(h, w, c), z_dim=args.z_dim, s_dim=args.s_dim,
            hidden_dim=tuple(args.hidden), cnn_kernels=tuple(args.kernels),
            cnn_strides=tuple(args.strides), cnn_channels=tuple(args.channels),
            y_logvar_dim=args.y_logvar_dim, learn_force=args.learn_force,
            dx=args.dx,
        )
    model = CVAE(**kw)
    variables, mstate = convert_state_dict(sd, model)
    if args.verify:
        _verify(sd, model, variables, seed=0)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "model.json"), "w") as f:
        json.dump({k: (list(v) if isinstance(v, tuple) else v)
                   for k, v in kw.items()}, f, indent=2)
    save_checkpoint(os.path.join(args.out, "checkpoint"),
                    {"variables": variables, "mstate": mstate})
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in __import__("jax").tree.leaves(variables))
    print(f"[import] wrote {args.out}: {n_params} params, "
          f"initialized={bool(mstate.initialized)}")
    print(f"[import] load back with "
          f"scripts.import_torch_checkpoint.load_imported({args.out!r})")


if __name__ == "__main__":
    main()
