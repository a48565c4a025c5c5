"""Compute per-variable normalization statistics over a tiff tree.

Port of tools/calc_mean_std.py:96: streaming mean/std per variable (vector
stats per pressure level for multiband files), sampling every 10th file like
the reference, written to `<result_path>/<var>.txt`.
"""

import argparse
import glob
import multiprocessing
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepphysinet_tpu.data.geotiff import read_full_image

DEFAULT_VARS = ["PSFC", "GHT", "t2", "TT", "u10", "UU", "v10", "VV", "q2", "QQ", "rio"]


def process(data_path, var_names, result_path, thread_id=0, sample_stride=10):
    os.makedirs(result_path, exist_ok=True)
    for var in var_names:
        files = sorted(
            glob.glob(os.path.join(data_path, "*", f"*_{var}.tiff"))
            + glob.glob(os.path.join(data_path, f"*_{var}.tiff"))
        )
        rng = np.random.RandomState(0)
        rng.shuffle(files)
        files = files[::sample_stride] or files
        if not files:
            print(f"{var}: no files")
            continue
        # streaming two-pass: sums then squared deviations, per channel
        total = None
        count = 0
        for f in files:
            img = read_full_image(f, as_rgb=False, normalize=False, data_format="NUMPY_FORMAT")
            s = img.reshape(-1, img.shape[-1]).sum(axis=0, dtype=np.float64)
            total = s if total is None else total + s
            count += img.shape[0] * img.shape[1]
        mean = total / count
        total_sq = None
        for f in files:
            img = read_full_image(f, as_rgb=False, normalize=False, data_format="NUMPY_FORMAT")
            d = (img.reshape(-1, img.shape[-1]).astype(np.float64) - mean) ** 2
            s = d.sum(axis=0)
            total_sq = s if total_sq is None else total_sq + s
        std = np.sqrt(total_sq / count)
        with open(os.path.join(result_path, f"{var}.txt"), "w") as fp:
            fp.write("mean:{0};\n std:{1};".format(mean.tolist(), std.tolist()))
        print(var, "mean", mean.tolist(), "std", std.tolist())


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--result_path", type=str, required=True)
    parser.add_argument("--num_threads", type=int, default=0)
    parser.add_argument("--vars", type=str, nargs="*", default=DEFAULT_VARS)
    parser.add_argument("--sample_stride", type=int, default=10,
                        help="use every Nth file (reference default: 10)")
    args = parser.parse_args()
    if args.num_threads <= 0:
        process(args.data_path, args.vars, args.result_path, 0, args.sample_stride)
    else:
        pool = multiprocessing.Pool(args.num_threads)
        n = args.num_threads
        v = args.vars
        for i in range(n):
            pool.apply_async(process, (args.data_path, v[i * len(v) // n : (i + 1) * len(v) // n],
                                       args.result_path, i))
        pool.close()
        pool.join()
