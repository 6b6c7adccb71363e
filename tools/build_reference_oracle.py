#!/usr/bin/env python3
"""Build the reference implementation as a test oracle (out-of-tree).

Compiles the read-only reference checkout's host simulation binaries into a
scratch directory so the framework's numerics can be cross-validated against
the original bit-for-bit:

  ref_detect_fp32 / ref_detect_int16 — the host CLI (yolov2_detect)
  ref_weight_gen                     — the weight reorganizer
  ref_detect_int16_dbg               — int16 CLI + per-layer arena dumps
                                        (env DBG_LAYER_DUMP_DIR)

The debug variant patches a dump hook into a *copy* of the reference's layer
sequencer (the copy lives only in the scratch dir; nothing enters this repo).
``hls/core/params.hpp`` is generated here with the default tile geometry
(Tm=32 Tn=4 Tr=Tc=13 K=3 S=2 — reference scripts/hw_params_gen.py:16-23).
"""

from __future__ import annotations

import os
import subprocess
import sys

REF = os.environ.get("YOLOTPU_REFERENCE", "/root/reference")
OUT = os.environ.get("YOLOTPU_ORACLE_DIR", "/tmp/yolotpu_ref_oracle")

PARAMS_HPP = """#pragma once
constexpr int S = 2;
constexpr int K = 3;
constexpr int MAX_BETA_LENGTH = 1024;
constexpr int Tn = 4;
constexpr int Tm = 32;
constexpr int Tr = 13;
constexpr int Tc = 13;
constexpr int OnChipIB_Width = 27;
constexpr int OnChipIB_Height = 27;
constexpr int TRow_max = 27;
constexpr int TCol_max = 27;
"""

DUMP_HOOK = """
        {   // DEBUG: dump this layer's output region of the arena
            const char *dd = std::getenv("DBG_LAYER_DUMP_DIR");
            if (dd && dd[0] && net->layers[i].type != ROUTE
                && net->layers[i].type != REGION) {
                char p[512];
                std::snprintf(p, sizeof p, "%s/layer%02d.bin", dd, i);
                FILE *df = std::fopen(p, "wb");
                if (df) {
                    int ow = net->layers[i].out_w;
                    int owa = ((ow + 7) / 8) * 8;
                    long cnt = (long)net->layers[i].out_c * net->layers[i].out_h * owa;
                    if (net->layers[i].type == REORG) cnt = 13*16*256;
                    std::fwrite(out_ptr[i], sizeof(IO_Dtype), cnt, df);
                    std::fclose(df);
                }
            }
        }
"""


def _sources(main_src: str, with_hls: bool, model_src: str | None = None):
    core = [f"{REF}/src/core/{n}.cpp" for n in
            ("yolo_image", "yolo_post", "yolo_utils", "yolo_cfg", "yolo_math",
             "yolo_region", "yolo_layers", "yolo_net")]
    hls = ([f"{REF}/hls/core/{n}.cpp" for n in
            ("core_io", "core_compute", "core_scheduler")]
           + [f"{REF}/hls/models/yolov2/yolo2_accel.cpp",
              model_src or f"{REF}/hls/models/yolov2/yolo2_model.cpp"]) if with_hls else []
    return ([main_src] + core + hls
            + [f"{REF}/hls/models/yolov2/model_config.cpp",
               f"{REF}/src/stb_image_implementation.cpp"])


def build(verbose: bool = True) -> str:
    if not os.path.isdir(REF):
        raise FileNotFoundError(f"reference checkout not found at {REF}")
    os.makedirs(f"{OUT}/hls/core", exist_ok=True)
    os.makedirs(f"{OUT}/inc2/core", exist_ok=True)
    for p in (f"{OUT}/hls/core/params.hpp", f"{OUT}/inc2/core/params.hpp"):
        with open(p, "w") as f:
            f.write(PARAMS_HPP)

    # patched sequencer copy with the per-layer dump hook
    src = open(f"{REF}/hls/models/yolov2/yolo2_model.cpp").read()
    tail = "        }\n    }\n\n    free(Memory_buf);"
    assert src.count(tail) == 1, "sequencer layout changed; update the patcher"
    open(f"{OUT}/dbg_model.cpp", "w").write(
        src.replace(tail, "        }\n" + DUMP_HOOK + "    }\n\n    free(Memory_buf);"))

    inc = [f"-I{OUT}/hls/core", f"-I{OUT}/inc2", f"-I{REF}/include",
           f"-I{REF}/include/core", f"-I{REF}/include/models/yolov2",
           f"-I{REF}/hls", f"-I{REF}/hls/core", f"-I{REF}/hls/models/yolov2"]
    common = ["g++", "-std=c++17", "-O2", "-w", "-DSTB_IMAGE_CPU_BUILD",
              "-DREORG_TEST"] + inc

    main = f"{REF}/src/models/yolov2/yolov2_main.cpp"
    gen = f"{REF}/src/models/yolov2/yolov2_weight_gen.cpp"
    targets = [
        (f"{OUT}/ref_detect_fp32", [], _sources(main, True)),
        (f"{OUT}/ref_detect_int16", ["-DINT16_MODE"], _sources(main, True)),
        (f"{OUT}/ref_detect_int16_dbg", ["-DINT16_MODE"],
         _sources(main, True, model_src=f"{OUT}/dbg_model.cpp")),
        (f"{OUT}/ref_weight_gen", [], _sources(gen, False)),
    ]
    for out, defs, srcs in targets:
        if os.path.exists(out):
            continue
        cmd = common + defs + ["-o", out] + srcs + ["-lm"]
        if verbose:
            print(f"building {os.path.basename(out)} ...", file=sys.stderr)
        subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build())
