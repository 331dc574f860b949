"""HDF5 demo-file tools (reference: scripts/merge_hdf5_files.py,
extract_single_demo_from_hdf5.py). Operates on the Isaac Lab Mimic HDF5
layout: a root "data" group with one "demo_N" subgroup per demo."""
from __future__ import annotations

import argparse
from typing import List


def list_demos(path: str) -> List[str]:
    import h5py

    with h5py.File(path, "r") as f:
        return sorted(f["data"].keys(), key=lambda n: int(n.split("_")[-1]))


def extract_single_demo(input_path: str, demo_name: str, output_path: str):
    """Copy one demo group (+ root attrs) to a new file as demo_0."""
    import h5py

    with h5py.File(input_path, "r") as src, h5py.File(output_path, "w") as dst:
        data = dst.create_group("data")
        for k, v in src["data"].attrs.items():
            data.attrs[k] = v
        src.copy(f"data/{demo_name}", data, name="demo_0")


def merge_hdf5_files(input_paths: List[str], output_path: str):
    """Concatenate all demos from the inputs, renumbering sequentially."""
    import h5py

    with h5py.File(output_path, "w") as dst:
        data = dst.create_group("data")
        idx = 0
        for input_path in input_paths:
            with h5py.File(input_path, "r") as src:
                if idx == 0:
                    for k, v in src["data"].attrs.items():
                        data.attrs[k] = v
                for name in sorted(
                    src["data"].keys(), key=lambda n: int(n.split("_")[-1])
                ):
                    src.copy(f"data/{name}", data, name=f"demo_{idx}")
                    idx += 1
        print(f"Merged {idx} demos into {output_path}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list")
    p_list.add_argument("input")
    p_extract = sub.add_parser("extract")
    p_extract.add_argument("input")
    p_extract.add_argument("demo_name")
    p_extract.add_argument("output")
    p_merge = sub.add_parser("merge")
    p_merge.add_argument("inputs", nargs="+")
    p_merge.add_argument("--output", required=True)
    args = parser.parse_args(argv)
    if args.cmd == "list":
        print("\n".join(list_demos(args.input)))
    elif args.cmd == "extract":
        extract_single_demo(args.input, args.demo_name, args.output)
    else:
        merge_hdf5_files(args.inputs, args.output)


if __name__ == "__main__":
    main()
