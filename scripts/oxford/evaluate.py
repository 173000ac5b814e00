"""Oxford-protocol evaluation: repeatability + matching score.

With the Oxford affine dataset present (scripts/oxford/download_oxford.sh)
this evaluates img1 vs img2..img6 of each sequence using the provided
H1to{n}p homographies — the metric-parity version of the reference's
golden-value test (testScripts/testOxfordDataset.sh.in). Without the
dataset (zero-egress environments) it falls back to synthetic homography
warps of a generated scene, which exercises the same code path and gives
a stable tracking number.

Usage:
    python scripts/oxford/evaluate.py [--data scripts/oxford/data]
                                      [--seqs boat graf] [--eps 2.5]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def extract_one(img):
    from popsift_tpu.api import PopSift
    from popsift_tpu.config import SiftConfig
    from popsift_tpu.eval.repeatability import (
        strongest_descriptor_per_keypoint)

    ps = PopSift(SiftConfig())
    feats = ps.enqueue(img).get()
    return strongest_descriptor_per_keypoint(feats)


def eval_sequence_dir(seq_dir, eps):
    from popsift_tpu.eval.repeatability import evaluate_pair
    from popsift_tpu.io.image import load_image

    imgs = sorted(glob.glob(os.path.join(seq_dir, "img*.p*m")))
    if not imgs:
        return None
    base = load_image(imgs[0])
    kp1, d1 = extract_one(base)
    rows = []
    for n in range(2, len(imgs) + 1):
        hfile = os.path.join(seq_dir, f"H1to{n}p")
        ifile = os.path.join(seq_dir, f"img{n}" + imgs[0][-4:])
        if not (os.path.exists(hfile) and os.path.exists(ifile)):
            continue
        H = np.loadtxt(hfile)
        img = load_image(ifile)
        kp2, d2 = extract_one(img)
        s = evaluate_pair(kp1, d1, kp2, d2, H, img.shape, eps=eps)
        rows.append((n, s))
    return rows


def eval_synthetic(eps, seed=0):
    """Offline fallback: synthetic scene + homography warps."""
    from popsift_tpu.eval.repeatability import (
        evaluate_pair, protocol_homographies, synthetic_scene, warp_image)

    h, w = 480, 640
    base = synthetic_scene(h, w, seed=seed)
    kp1, d1 = extract_one(base)

    rows = []
    for n, H in enumerate(protocol_homographies(h, w), start=2):
        warped = warp_image(base, H)
        kp2, d2 = extract_one(warped)
        s = evaluate_pair(kp1, d1, kp2, d2, H, warped.shape, eps=eps)
        rows.append((n, s))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data",
                    default=os.path.join(os.path.dirname(__file__), "data"))
    ap.add_argument("--seqs", nargs="*", default=None)
    ap.add_argument("--eps", type=float, default=2.5)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    results = {}
    seq_dirs = sorted(glob.glob(os.path.join(args.data, "*")))
    if args.seqs:
        seq_dirs = [d for d in seq_dirs
                    if os.path.basename(d) in args.seqs]

    ran_real = False
    for d in seq_dirs:
        rows = eval_sequence_dir(d, args.eps)
        if rows:
            results[os.path.basename(d)] = rows
            ran_real = True

    if not ran_real:
        print("# Oxford dataset not found; synthetic-homography fallback",
              file=sys.stderr)
        results["synthetic"] = eval_synthetic(args.eps)

    summary = {}
    for seq, rows in results.items():
        reps = [s.repeatability for _, s in rows]
        ms = [s.matching_score for _, s in rows]
        summary[seq] = {"repeatability": round(float(np.mean(reps)), 4),
                        "matching_score": round(float(np.mean(ms)), 4)}
        if not args.json:
            print(f"== {seq}")
            for n, s in rows:
                print(f"  1->{n}: repeatability {s.repeatability:.3f}  "
                      f"matching {s.matching_score:.3f}  "
                      f"(common {s.n_common})")
    if args.json:
        print(json.dumps(summary))
    else:
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
