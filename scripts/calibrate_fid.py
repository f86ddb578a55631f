"""One-command FID calibration for when real Inception weights land.

The reference downloads Google's frozen classify_image Inception at runtime
(reference metrics/fid_new.py:291-317); this environment has no egress, so
the weights ship as a file.  The de-facto standard file is pytorch-fid's

    pt_inception-2015-12-05-6726825d.pth
    https://github.com/mseitzer/pytorch-fid/releases/download/
        fid_weights/pt_inception-2015-12-05-6726825d.pth

(`6726825d` is the first 8 hex chars of the file's sha256 — the torch.hub
download convention — verified here before conversion.)

Usage:
    python scripts/calibrate_fid.py pt_inception-2015-12-05-6726825d.pth \
        [--out inception_fid.npz]

Steps:
  1. sha256-prefix check of the .pth against the name-embedded hash;
  2. convert the torch state dict -> name-keyed npz
     (saragan_tpu.metrics.inception.convert_torch_state_dict);
  3. self-FID check: FID(batch, same batch) ~ 0;
  4. corruption-ordering check: FID must increase monotonically with
     box-corruption level (the reference's fid.py:409-464 battery);
  5. prints the export line to make the calibrated npz the default
     (SARAGAN_INCEPTION_NPZ), after which every `--compute_FID` run reports
     standard, paper-comparable FID.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("pth", help="pt_inception-*.pth torch state dict")
    ap.add_argument("--out", default="inception_fid.npz")
    ap.add_argument(
        "--skip_hash", action="store_true",
        help="skip the filename-hash check (non-standard weight files)",
    )
    args = ap.parse_args()

    # 1. hash check (torch.hub convention: filename carries sha256[:8])
    m = re.search(r"-([0-9a-f]{8})\.pth$", os.path.basename(args.pth))
    if m and not args.skip_hash:
        digest = hashlib.sha256(open(args.pth, "rb").read()).hexdigest()
        if not digest.startswith(m.group(1)):
            print(
                f"FAIL: sha256 {digest[:8]}... does not match the "
                f"name-embedded hash {m.group(1)} — wrong or corrupt file",
            )
            return 1
        print(f"sha256 prefix ok: {digest[:16]}...")
    elif not args.skip_hash:
        print("NOTE: filename carries no -<sha256[:8]>.pth hash; skipping check")

    # 2. convert
    from saragan_tpu.metrics.fid import calculate_fid_given_batch_volumes
    from saragan_tpu.metrics.inception import (
        InceptionPool3Features,
        convert_torch_state_dict,
        load_inception_npz,
        save_inception_npz,
    )

    params = convert_torch_state_dict(args.pth)
    save_inception_npz(params, args.out)
    extractor = InceptionPool3Features(load_inception_npz(args.out))
    print(f"converted {len(params)} tensors -> {args.out}")

    # 3. self-FID ~ 0
    rng = np.random.default_rng(0)
    vols = rng.normal(size=(4, 1, 8, 64, 64)).astype(np.float32)
    self_fid = calculate_fid_given_batch_volumes(vols, vols.copy(), extractor, verbose=False)
    print(f"self-FID: {self_fid:.6f}")
    if not abs(self_fid) < 1e-3:
        print("FAIL: self-FID is not ~0")
        return 1

    # 4. corruption ordering (reference metrics/fid.py:409-464)
    from saragan_tpu.utils import uniform_box_sampler

    def corrupt(v, boxes, seed):
        r = np.random.default_rng(seed)
        out = v.copy()
        n, _, d, h, w = out.shape
        for i in range(n):
            for _ in range(boxes):
                sl, _ = uniform_box_sampler(
                    out[i, 0], (d // 4, h // 4, w // 4), (d // 2, h // 2, w // 2), rng=r
                )
                out[(i, 0) + sl] = 0.0
        return out

    real = rng.normal(size=(4, 1, 8, 64, 64)).astype(np.float32)
    clean = rng.normal(size=(4, 1, 8, 64, 64)).astype(np.float32)
    fids = [
        calculate_fid_given_batch_volumes(real, f, extractor, verbose=False)
        for f in (clean, corrupt(clean, 8, 1), corrupt(clean, 16, 2))
    ]
    print("corruption FIDs (clean/light/heavy): " + ", ".join(f"{f:.4g}" for f in fids))
    if not (fids[0] < fids[1] < fids[2]):
        print("FAIL: FID is not monotone in corruption level")
        return 1

    print("CALIBRATION OK")
    print(f"export SARAGAN_INCEPTION_NPZ={os.path.abspath(args.out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
