#!/usr/bin/env python
"""Convert an HF CLIP checkpoint directory to a seesaw_tpu artifact dir.

Input: a directory as produced by `CLIPModel.save_pretrained` (config.json +
model.safetensors or pytorch_model.bin) with the tokenizer files
(vocab.json + merges.txt) alongside — exactly what the reference points
HGWrapper at (`/root/reference/seesaw/models/embeddings.py:435-441`).

Output: <out>/params.npz (flax tree, flat '/'-joined keys), info.json
(architecture dims + variant tag), and the copied vocab/merges, loadable via
the model registry as  clip-<variant>:<out>  or
`ClipEmbedding.from_artifact(out)`.

Usage:
    python scripts/convert_clip_checkpoint.py <hf_dir> <out_dir> [--variant vit-b32]
"""
import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_hf_state_dict(hf_dir: Path) -> dict:
    st = hf_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(str(st))
    bins = sorted(hf_dir.glob("pytorch_model*.bin"))
    if not bins:
        raise FileNotFoundError(f"no model.safetensors or pytorch_model*.bin in {hf_dir}")
    import torch

    sd = {}
    for b in bins:
        part = torch.load(b, map_location="cpu", weights_only=True)
        sd.update({k: v.numpy() for k, v in part.items()})
    return sd


def convert(hf_dir: str, out_dir: str, variant: str = "vit-b32") -> Path:
    from seesaw_tpu.models.clip import (
        config_from_hf,
        config_to_info,
        convert_hf_state_dict,
        save_params_npz,
    )

    hf_dir, out = Path(hf_dir), Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    hf_cfg = json.loads((hf_dir / "config.json").read_text())
    cfg = config_from_hf(hf_cfg)
    sd = load_hf_state_dict(hf_dir)
    # strip the "text_model.embeddings." wrapper prefixes HF sometimes adds
    sd = {k.removeprefix("clip."): v for k, v in sd.items()}
    params = convert_hf_state_dict(sd, cfg)
    save_params_npz(params, str(out / "params.npz"))

    info = config_to_info(cfg)
    info["variant"] = variant
    info["source"] = str(hf_dir)
    (out / "info.json").write_text(json.dumps(info, indent=2))

    for name in ("vocab.json", "merges.txt"):
        src = hf_dir / name
        if src.exists():
            shutil.copy(src, out / name)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("hf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--variant", default="vit-b32")
    args = ap.parse_args()
    out = convert(args.hf_dir, args.out_dir, args.variant)
    print(f"wrote {out} (load with model spec 'clip-{args.variant}:{out}')")


if __name__ == "__main__":
    main()
