#!/usr/bin/env python
"""Move UCF101 videos into train/ and val/ by the official fold lists
(port of reference ucf_split_train_test.py:1-24)."""
import argparse
import shutil
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", required=True,
                    help="extracted UCF-101 directory")
    ap.add_argument("--splits", required=True,
                    help="ucfTrainTestlist directory")
    ap.add_argument("--out", default=".", help="output root")
    ap.add_argument("--fold", type=int, default=1, choices=[1, 2, 3])
    args = ap.parse_args()

    videos = Path(args.videos)
    out = Path(args.out)
    for split, fname in (("train", f"trainlist0{args.fold}.txt"),
                         ("val", f"testlist0{args.fold}.txt")):
        listing = Path(args.splits) / fname
        for line in listing.read_text().splitlines():
            rel = line.strip().split()[0]
            if not rel:
                continue
            src = videos / rel
            dst = out / split / rel
            if not src.exists():
                continue
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(src), str(dst))
        print(f"{split}: done ({fname})")


if __name__ == "__main__":
    main()
