#!/usr/bin/env python
"""Vendor the lubrication resistance-scalar tables into the package.

The reference ships tabulated resistance/mobility scalar functions as
whitespace text files (Lubrication/Resistance_Coefs/*.txt, loaded by
Lubrication/Lubrication_Class.cc:54-100). They are NUMERIC DATA — values
of published near-field hydrodynamic functions (Jeffrey & Onishi 1984
pair resistance scalars; wall scalars from resolved 2562-blob sphere
computations) — so a standalone framework vendors them verbatim with
provenance rather than re-deriving published tables.

This script parses a reference checkout's table directory with the same
readers models/lubrication.py uses and writes one compressed .npz into
rigidmultiblobswall_tpu/data/. Re-run only to refresh from a newer
reference checkout:

    python tools/vendor_lub_tables.py [table_dir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rigidmultiblobswall_tpu.models import lubrication as lub


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/Lubrication/Resistance_Coefs"
    t = lub.LubricationTables.load_from_dir(src)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rigidmultiblobswall_tpu", "data")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "lubrication_tables.npz")
    np.savez_compressed(
        out, **{f.name: getattr(t, f.name)
                for f in t.__dataclass_fields__.values()})
    print(f"wrote {out} ({os.path.getsize(out)} bytes) from {src}")


if __name__ == "__main__":
    main()
