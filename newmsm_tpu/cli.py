"""`newmsm`-compatible command line (msmOptions.h:59-157, newmsm.cpp:6-72).

Usage mirrors the reference binary:

    python -m newmsm_tpu.cli --inmesh in.surf.gii --refmesh ref.surf.gii \
        --indata in.func.gii --refdata ref.func.gii -o out/ --conf config

    python -m newmsm_tpu.cli --groupwise --meshes meshes.txt --data data.txt \
        --template template.surf.gii -o out/
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="newmsm", add_help=False,
        description="TPU-native Multimodal Surface Matching (newMSM-compatible)")
    p.add_argument("-h", "--help", action="help")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("-p", "--printoptions", action="store_true",
                   help="print configuration file options")
    p.add_argument("-d", "--debug", action="store_true")
    p.add_argument("-g", "--groupwise", action="store_true")
    p.add_argument("-m", "--meshes", default="",
                   help="groupwise: list file of input sphere paths")
    p.add_argument("-s", "--template", default="",
                   help="groupwise: template sphere")
    p.add_argument("-l", "--data", default="",
                   help="groupwise: list file of data paths")
    p.add_argument("-k", "--mask", default="")
    p.add_argument("-M", "--inmesh", default="")
    p.add_argument("-R", "--refmesh", default="")
    p.add_argument("-a", "--inanat", default="")
    p.add_argument("-A", "--refanat", default="")
    p.add_argument("-i", "--indata", default="")
    p.add_argument("-I", "--refdata", default="")
    p.add_argument("-t", "--trans", default="")
    p.add_argument("-w", "--inweight", default="")
    p.add_argument("-W", "--refweight", default="")
    p.add_argument("-o", "--out", default="")
    p.add_argument("-f", "--format", default="GIFTI",
                   choices=["GIFTI", "VTK", "ASCII", "ASCII_MAT"])
    p.add_argument("-c", "--conf", default="", help="configuration file")
    p.add_argument("--metrics", default="",
                   help="write per-iteration JSONL metrics to this file")
    p.add_argument("--profile", default="",
                   help="write a jax.profiler device trace to this directory")
    return p


def read_list_file(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def print_config_options():
    from .reg import config as C
    print("newmsm configuration parameters (per-level lists are comma separated):")
    for flag in sorted(list(C._LIST_FLAGS) + list(C._SCALAR_FLAGS)
                       + list(C._BOOL_FLAGS) + ["INc"]):
        print(f"  --{flag}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .core.cache import enable_compile_cache
    enable_compile_cache()

    if args.printoptions:
        print_config_options()
        return 0

    if args.verbose:
        print("This is newmsm_tpu (newMSM-compatible, TPU-native).")

    if args.groupwise:
        from .reg.group import GroupMeshRegistration
        gmr = GroupMeshRegistration()
        gmr.verbose = args.verbose
        gmr.debug = args.debug
        gmr.metrics_path = args.metrics or None
        gmr.profile_dir = args.profile or None
        gmr.outdir = args.out
        gmr.set_inputs(read_list_file(args.meshes))
        gmr.set_data_list(read_list_file(args.data))
        gmr.set_template(args.template)
        if args.mask:
            gmr.set_mask(args.mask)
        gmr.run_multiresolutions(args.conf or None)
        return 0

    from .reg.driver import MeshRegistration
    mr = MeshRegistration()
    mr.verbose = args.verbose
    mr.metrics_path = args.metrics or None
    mr.profile_dir = args.profile or None
    mr.debug = args.debug
    mr.outdir = args.out
    if not args.inmesh:
        print("error: --inmesh is required", file=sys.stderr)
        return 1
    mr.set_input(args.inmesh)
    mr.set_reference(args.refmesh if args.refmesh else args.inmesh)
    if args.indata:
        mr.set_input_data(args.indata)
    if args.refdata:
        mr.set_reference_data(args.refdata)
    if args.inanat or args.refanat:
        if not (args.inanat and args.refanat):
            print("error: must supply both anatomical meshes or none",
                  file=sys.stderr)
            return 1
        mr.set_anatomical(args.inanat, args.refanat)
    mr.set_output_format(args.format)
    if args.trans:
        mr.set_transformed(args.trans)
    if args.inweight:
        mr.set_input_cfweighting(args.inweight)
    if args.refweight:
        mr.set_reference_cfweighting(args.refweight)
    mr.run_multiresolutions(args.conf or None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
