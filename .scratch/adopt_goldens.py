"""Adopt freshly regenerated dataset CSVs into results/ iff accuracy holds.

Run by .scratch/post_validate.sh after the TPU golden regeneration. For each
dataset whose regen CSV exists, compute mean/max rotation_error (column 11 of
the reference's 12-column schema, first data row is the 0.0 anchor like the
committed goldens) and copy the regen directory's CSV over results/<name>/
only when the new stats hold or improve within tolerance (mean +0.25 deg,
max +1.0 deg — regen noise, not regressions). Prints one line per dataset so
the chain log records the decision; never raises (the chain must proceed to
bench regardless).
"""
import csv
import shutil
import sys


def stats(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    errs = [float(r["rotation_error"]) for r in rows]
    return sum(errs) / len(errs), max(errs), len(errs)


def adopt(name, regen_dir, results_dir):
    new_csv = f"{regen_dir}/evaluation_results.csv"
    cur_csv = f"{results_dir}/evaluation_results.csv"
    try:
        nm, nx, nn = stats(new_csv)
    except Exception as e:  # regen missing/failed: keep current goldens
        print(f"[adopt] {name}: SKIP (no usable regen: {e})")
        return
    try:
        cm, cx, cn = stats(cur_csv)
    except Exception:
        cm, cx, cn = float("inf"), float("inf"), nn
    if nn != cn:
        print(f"[adopt] {name}: SKIP (pair count {nn} != committed {cn})")
        return
    if nm <= cm + 0.25 and nx <= cx + 1.0:
        shutil.copyfile(new_csv, cur_csv)
        print(f"[adopt] {name}: ADOPTED mean {cm:.2f}->{nm:.2f} "
              f"max {cx:.2f}->{nx:.2f} ({nn} pairs)")
    else:
        print(f"[adopt] {name}: REJECTED (mean {cm:.2f}->{nm:.2f} "
              f"max {cx:.2f}->{nx:.2f}) — investigate before adopting")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    adopt("simulator", f"{root}/regen_sim", "results/simulator-data")
    adopt("phone", f"{root}/regen_phone", "results/phone-data")
    adopt("salah", f"{root}/regen_salah", "results/vo_dataset_salah")
