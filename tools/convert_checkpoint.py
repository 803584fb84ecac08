"""Checkpoint conversion CLI: HF ↔ leopard-tpu native (orbax).

Tool parity with toolkits/model_checkpoints_convertor/
(hf2megatron_llava.py / idefics2_hf2mg.py drivers) — bidirectional:

  # HF → native
  python tools/convert_checkpoint.py --direction hf2native \
      --arch leopard_llava --input /ckpts/leopard-llava-hf --output ckpt/

  # native → HF state dict (safetensors)
  python tools/convert_checkpoint.py --direction native2hf \
      --arch leopard_llava --input ckpt/ --output /ckpts/export/
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--direction", choices=["hf2native", "native2hf"], required=True)
    p.add_argument("--arch", default="leopard_llava",
                   choices=["leopard_llava", "leopard_idefics2", "llama", "mistral"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    import jax
    import numpy as np

    from leopard_tpu import config as cfgs
    from leopard_tpu.convert import hf as chf
    from leopard_tpu.training.checkpoint import CheckpointManager

    cfg = {
        "leopard_llava": cfgs.leopard_llava_8b,
        "leopard_idefics2": cfgs.leopard_idefics2_8b,
        "llama": cfgs.leopard_llava_8b,     # text part only
        "mistral": cfgs.leopard_idefics2_8b,
    }[args.arch]()

    if args.direction == "hf2native":
        sd = chf.load_hf_state_dict(args.input)
        if args.arch == "leopard_llava":
            params = chf.convert_leopard_llava(sd, cfg)
        elif args.arch == "leopard_idefics2":
            params = chf.convert_leopard_idefics2(sd, cfg)
        elif args.arch == "llama":
            params = {"text": chf.convert_decoder(sd, cfg.text, "model.")}
        else:
            params = {"text": chf.convert_decoder(sd, cfg.text, "model.")}
        mgr = CheckpointManager(args.output, async_save=False)
        mgr.save(0, params, config={"arch": args.arch})
        mgr.wait_until_finished()
        mgr.close()
        print(f"saved native checkpoint to {args.output}")
    else:
        mgr = CheckpointManager(args.input, async_save=False)
        params, _ = mgr.restore()
        mgr.close()
        if args.arch == "leopard_llava":
            sd = chf.export_leopard_llava(params, cfg)
        elif args.arch == "leopard_idefics2":
            sd = chf.export_leopard_idefics2(params, cfg)
        else:  # text-only families
            sd = chf.export_decoder(params["text"], cfg.text, "model.")
        os.makedirs(args.output, exist_ok=True)
        try:
            from safetensors.numpy import save_file

            save_file(
                {k: np.asarray(v) for k, v in sd.items()},
                os.path.join(args.output, "model.safetensors"),
            )
        except ImportError:
            np.savez(os.path.join(args.output, "model.npz"), **sd)
        print(f"exported {len(sd)} tensors to {args.output}")


if __name__ == "__main__":
    main()
