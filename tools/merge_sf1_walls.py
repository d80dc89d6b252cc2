#!/usr/bin/env python3
"""Merge the r16 sf1 wall extension (the 159 queries beyond the r14
top-22) into DUCK_WALLS_SF1.json, preserving the already-measured
top-22 values and unioning the timed_out lists.

Usage: python3 tools/merge_sf1_walls.py <rest.json> [DUCK_WALLS_SF1.json]
"""
import sys, json

rest_path = sys.argv[1]
out_path = sys.argv[2] if len(sys.argv) > 2 else "DUCK_WALLS_SF1.json"
base = json.load(open(out_path))
rest = json.load(open(rest_path))
overlap = set(base["walls"]) & set(rest["walls"])
if overlap:
    sys.exit(f"refusing to merge: overlapping walls {sorted(overlap)}")
base["walls"].update(rest["walls"])
base["timed_out"] = sorted(set(base.get("timed_out", [])) | set(rest.get("timed_out", [])))
base["note"] += (" | r16: extended from the r14 top-22 to the full query set "
                 "(remaining 159 run with the same 600 s cap; timed_out lists merged)")
json.dump(base, open(out_path, "w"), indent=1)
done = sum(1 for v in base["walls"].values() if v is not None)
print(f"merged: {done}/{len(base['walls'])} timed, {len(base['timed_out'])} timeouts, "
      f"total {round(sum(v for v in base['walls'].values() if v), 1)} s")
