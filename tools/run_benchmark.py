#!/usr/bin/env python
"""Multi-sequence benchmark runner (the reference's vio_benchmark equivalent:
run every sequence, collect ATE vs ground truth, print a summary table).

    python tools/run_benchmark.py seq_dir1 seq_dir2 ... [-params...]
    python tools/run_benchmark.py --glob '/data/euroc/*'   # dirs with mav0 or data.jsonl

Each sequence runs through the CLI pipeline (hybvio_tpu.cli.main) with the
same extra parameter flags; the compiled XLA programs are reused across
sequences of identical resolution/config (JAX compilation cache). Ground
truth is read from data.jsonl echo lines or the EuRoC ground-truth csv.
Prints one summary JSON line (per-sequence ATE + FPS + the aggregate).
"""
import glob as globmod
import json
import os
import sys
import tempfile
import time



import os
import sys

# run from anywhere without touching PYTHONPATH (the axon jax
# plugin lives on the ambient PYTHONPATH; don't make users replace it)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
def gt_from_dataset(dataset: str):
    import numpy as np

    gt_csv = os.path.join(dataset, "state_groundtruth_estimate0", "data.csv")
    if not os.path.exists(gt_csv):
        gt_csv = os.path.join(dataset, "mav0", "state_groundtruth_estimate0",
                              "data.csv")
    if os.path.exists(gt_csv):
        rows = []
        with open(gt_csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                v = line.strip().split(",")
                rows.append([int(v[0]) * 1e-9] + [float(x) for x in v[1:4]])
        return np.asarray(rows)
    data_jsonl = os.path.join(dataset, "data.jsonl")
    if os.path.exists(data_jsonl):
        from hybvio_tpu.io.jsonl import get_pose_histories

        hist = get_pose_histories(data_jsonl)
        gt = hist.get("groundTruth")
        if gt is not None and len(gt):
            return gt[:, :4]  # t, x, y, z
    return None


def run_sequence(dataset: str, extra_args, max_frames: int = 0):
    import numpy as np

    from hybvio_tpu.cli.main import run as cli_run
    from hybvio_tpu.eval.ate import ate_rmse

    out_path = os.path.join(tempfile.mkdtemp(), "out.jsonl")
    args = [f"-i={dataset}", f"-o={out_path}"] + list(extra_args)
    if max_frames:
        args.append(f"-maxFrames={max_frames}")
    t0 = time.time()
    rc = cli_run(args)
    elapsed = time.time() - t0
    if rc != 0:
        return {"dataset": dataset, "error": f"cli exit {rc}"}
    est = []
    with open(out_path) as f:
        for line in f:
            d = json.loads(line)
            est.append([d["time"], d["position"]["x"], d["position"]["y"],
                        d["position"]["z"]])
    est = np.asarray(est)
    result = {"dataset": os.path.basename(dataset.rstrip("/")),
              "frames": len(est),
              "fps": round(len(est) / max(elapsed, 1e-9), 2)}
    gt = gt_from_dataset(dataset)
    if gt is not None and len(est) > 5:
        gt_at = np.stack([
            np.interp(est[:, 0], gt[:, 0], gt[:, 1 + i]) for i in range(3)],
            axis=1)
        gt_at -= gt_at[0]
        if np.isfinite(est[:, 1:4]).all():
            result["ate_rmse_m"] = round(float(ate_rmse(est[:, 1:4], gt_at)), 4)
        else:
            result["ate_rmse_m"] = None
    return result


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    datasets = []
    extra = []
    max_frames = 0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--glob":
            i += 1
            datasets.extend(sorted(d for d in globmod.glob(argv[i])
                                   if os.path.isdir(d)))
        elif a.startswith("--maxFrames="):
            max_frames = int(a.split("=", 1)[1])
        elif a.startswith("-"):
            extra.append(a)
        else:
            datasets.append(a)
        i += 1
    if not datasets:
        print(__doc__)
        return 2
    results = [run_sequence(d, extra, max_frames) for d in datasets]
    ates = [r["ate_rmse_m"] for r in results
            if r.get("ate_rmse_m") is not None]
    import numpy as np

    summary = {
        "sequences": results,
        "ate_rmse_m_median": round(float(np.median(ates)), 4) if ates else None,
        "ate_rmse_m_mean": round(float(np.mean(ates)), 4) if ates else None,
        "completed": sum(1 for r in results if "error" not in r),
        "total": len(results),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
