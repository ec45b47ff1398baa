#!/usr/bin/env python
"""Extract the IQ-quant codebook grids from a ggml-common.h into an .npz.

The i-quant formats (IQ1/IQ2/IQ3) decode through fixed lattice codebooks that
are part of the GGUF on-disk format contract.  This tool pulls the tables out
of a ggml source tree (default: the read-only reference checkout) and stores
them as binary data consumed by booster_tpu/quant/formats.py.

Usage: python tools/extract_iq_grids.py [ggml-common.h path] [out.npz]
"""

from __future__ import annotations

import re
import sys

import numpy as np

DEFAULT_SRC = "/root/reference/cpp/ggml/src/ggml-common.h"
DEFAULT_OUT = "booster_tpu/quant/iq_grids.npz"

TABLES = {
    "iq2xxs_grid": np.uint64,
    "iq2xs_grid": np.uint64,
    "iq2s_grid": np.uint64,
    "iq3xxs_grid": np.uint32,
    "iq3s_grid": np.uint32,
    "iq1s_grid": np.uint64,
}


def extract(src_path: str) -> dict[str, np.ndarray]:
    text = open(src_path).read()
    out = {}
    for name, dtype in TABLES.items():
        m = re.search(
            rf"GGML_TABLE_BEGIN\(\w+,\s*{name}\s*,[^)]*\)(.*?)GGML_TABLE_END\(\)",
            text,
            re.S,
        )
        if not m:
            raise ValueError(f"table {name} not found in {src_path}")
        values = [int(v, 16) for v in re.findall(r"0x[0-9a-fA-F]+", m.group(1))]
        out[name] = np.array(values, dtype=dtype)
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    dst = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    tables = extract(src)
    for name, arr in tables.items():
        print(f"{name}: {arr.shape} {arr.dtype}")
    np.savez_compressed(dst, **tables)
    print(f"wrote {dst}")
