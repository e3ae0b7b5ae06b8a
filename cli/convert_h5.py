"""Convert reference-format h5 mask files to masks.json (capability parity
with reference prepare_datasets/convert_h5_to_json.py, minus its eval() of
untrusted strings — we parse with ast.literal_eval).

Usage: python -m cli.convert_h5 --input masks.h5 --output masks.json
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(input_path: str, output_path: str) -> int:
    import h5py

    results = []
    with h5py.File(input_path, "r") as h5:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                raw = obj[()]
                if isinstance(raw, bytes):
                    raw = raw.decode("utf-8")
                record = ast.literal_eval(str(raw))
                if isinstance(record, dict) and "masks" in record:
                    results.append(record)
                else:  # reference layout: dataset value is the masks list
                    results.append({"image": name, "masks": record})

        h5.visititems(visit)
    with open(output_path, "w") as f:
        json.dump(results, f)
    return len(results)


def main(argv=None):
    p = argparse.ArgumentParser("convert_h5")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)
    n = convert(args.input, args.output)
    print(f"wrote {args.output} ({n} images)")


if __name__ == "__main__":
    main()
