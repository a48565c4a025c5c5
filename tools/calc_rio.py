"""Derive surface air density (rio) tiffs from PSFC / t2 / q2 tiffs.

Port of tools/calc_rio.py:42: rho = P / ((1 + 0.608 q) R_d T) via the moist
gas law, written next to each `*_PSFC.tiff`.  Pure numpy + the built-in
GeoTIFF codec (no GDAL).
"""

import argparse
import glob
import multiprocessing
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepphysinet_tpu.data.geotiff import read_full_image, save_full_image
from deepphysinet_tpu.utils import path_utils

R_D = 287.0


def process(data_files, thread_id=0):
    for data_file in data_files:
        file_name = path_utils.get_filename(data_file, is_suffix=False).replace("_PSFC", "")
        p_path = path_utils.get_parent_folder(data_file, with_root=True)
        rio_file = os.path.join(p_path, f"{file_name}_rio.tiff")
        if os.path.exists(rio_file):
            continue
        t_file = os.path.join(p_path, f"{file_name}_t2.tiff")
        q_file = os.path.join(p_path, f"{file_name}_q2.tiff")
        if not (os.path.exists(t_file) and os.path.exists(q_file)):
            continue
        P = read_full_image(data_file, as_rgb=False, normalize=False)[0]
        T = read_full_image(t_file, as_rgb=False, normalize=False)[0]
        q = read_full_image(q_file, as_rgb=False, normalize=False)[0]
        rio = P / ((1 + 0.608 * q) * R_D) / T
        save_full_image(rio_file, rio.astype(np.float32), compression="deflate", tiled=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--num_threads", type=int, default=0)
    args = parser.parse_args()
    files = glob.glob(os.path.join(args.data_path, "*/*_PSFC.tiff"))
    files += glob.glob(os.path.join(args.data_path, "*_PSFC.tiff"))
    if args.num_threads <= 0:
        process(files, 0)
    else:
        pool = multiprocessing.Pool(args.num_threads)
        n = args.num_threads
        for i in range(n):
            pool.apply_async(process, (files[i * len(files) // n : (i + 1) * len(files) // n], i))
        pool.close()
        pool.join()
