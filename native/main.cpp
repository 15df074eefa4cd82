// drstencil CLI — flag-compatible with the reference binary (main.cpp:12-115)
// but emitting a specialized Pallas/TPU program instead of CUDA.

#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>

#include "drstencil.hpp"
#include "emit.hpp"

static const char* kHelp = R"(
    Generate a data-reusing TPU stencil program (Pallas/JAX).

    Usage: drstencil [options] <input_stcfile>
Options:

-o <file>               Name of the output Python program. (out.py by default)

--3d                    3D mode (also auto-detected from an 'L' grid size
                        in the .stc file; a mismatch is an error).

--step <num>            Number of time steps to fuse. (1 by default)

--dist <num>            Data-reuse distance between points.
                        (auto: half the fused streaming extent)

--bx <num>              Rows per streaming strip (VMEM tile height; the TPU
                        analogue of the CUDA block size). (auto by default)

--streaming             Accepted for reference parity; the TPU kernel always
                        streams the outer axis through VMEM.

--prefetch [<depth>]    Window-fetch pipeline depth: 2 = double-buffered DMA
                        (the default — the reference's prefetch, automatic
                        on TPU), 1 = synchronous fetch (prefetch off).
                        Bare --prefetch keeps the default for reference
                        CLI parity; Mosaic rejects depth > 2.

--by/--sn/--stream-unroll/--block-merge-x/--block-merge-y/
--cyclic-merge-x/--cyclic-merge-y
                        Accepted for reference parity and recorded in the
                        generated header; on TPU these map to tile-shape
                        selection and the automatic Pallas DMA pipeline.

--merge-forward <num>   Threshold below which a non-streaming forward set is
                        folded back into backward. (5 by default)

--dtype <t>             Device dtype: float32 (default) or bfloat16.

--trapezoid             For --step > 1: apply the base stencil step times
                        through VMEM scratch instead of coefficient fusion
                        (FLOPs linear in step; wins for wide stencils).

--lane-mode <m>         Lane-shift strategy: slice | roll (default: auto).

--vfuse                 With --trapezoid: chain intermediate levels through
                        chunk-local values instead of VMEM scratch.

--jfix <m>              3D j-frame restoration: outer (post-kernel fixup,
                        default) | kernel (in-kernel restore; measured 8%
                        faster on 3d7pt_star).

--block <b>             With --trapezoid: each level applies the b-step
                        coefficient-fused base operator (step/b levels —
                        the hybrid of the two fusion strategies; default 1).

--ch <rows>             Accumulation chunk rows (must divide tile rows,
                        multiple of 8; default: auto ~2MB temporaries).

--shard <n>             Emit the multi-chip program: the shard-local kernel
                        under a shard_map over an n-device mesh with
                        ppermute halo exchange (leading dim must divide by n).

--check                 Emit the fp64 golden check path (--check at runtime).

--gold                  Emit a golden-model-only program.

--dump-analysis         Print the analysis (fused taps, partition) as JSON
                        and exit without emitting a program.

--help  (-h)            Print this help.
)";

int main(int argc, char** argv) {
    std::string out_name = "out.py";
    bool is3d = false, dump = false;
    int step = 1, distance = 0, merge_f = 5;
    drs::EmitConfig ecfg;

    if (argc < 2) {
        std::cout << "Please specify the .stc file." << std::endl;
        return 0;
    }
    if (!std::strcmp(argv[1], "--help") || !std::strcmp(argv[1], "-h")) {
        std::cout << kHelp << std::endl;
        return 0;
    }

    auto need_val = [&](int& i) -> const char* {
        if (i + 1 >= argc - 1) {
            std::cout << "Illegal input: missing value for " << argv[i]
                      << std::endl;
            std::exit(-1);
        }
        return argv[++i];
    };

    for (int i = 1; i < argc - 1; ++i) {
        std::string a = argv[i];
        if (a == "-o") out_name = need_val(i);
        else if (a == "--3d") is3d = true;
        else if (a == "--step") step = std::atoi(need_val(i));
        else if (a == "--dist") distance = std::atoi(need_val(i));
        else if (a == "--streaming") ecfg.streaming = true;
        else if (a == "--bx") ecfg.tm = std::atoi(need_val(i));
        else if (a == "--ch") ecfg.ch = std::atoi(need_val(i));
        else if (a == "--by") ecfg.by = std::atoi(need_val(i));
        else if (a == "--sn") ecfg.sn = std::atoi(need_val(i));
        else if (a == "--stream-unroll") ecfg.stream_unroll = std::atoi(need_val(i));
        else if (a == "--block-merge-x") ecfg.bmx = std::atoi(need_val(i));
        else if (a == "--block-merge-y") ecfg.bmy = std::atoi(need_val(i));
        else if (a == "--cyclic-merge-x") ecfg.cmx = std::atoi(need_val(i));
        else if (a == "--cyclic-merge-y") ecfg.cmy = std::atoi(need_val(i));
        else if (a == "--prefetch") {
            // optional depth value (TPU-live): "--prefetch 1" = synchronous
            // window fetch, "--prefetch [2]" = double-buffered (default).
            // A numeric operand that is not a legal depth must error here,
            // not fall through as a mystery "unknown option".
            std::string nxt = (i + 1 < argc - 1) ? argv[i + 1] : "";
            bool numeric = !nxt.empty() &&
                nxt.find_first_not_of("0123456789") == std::string::npos;
            if (nxt == "1" || nxt == "2") ecfg.prefetch = std::atoi(argv[++i]);
            else if (numeric) {
                std::cerr << "Illegal input: --prefetch depth must be 1 or 2"
                          << " (got " << nxt << ")\n";
                return 1;
            }
            else ecfg.prefetch = 2;
        }
        else if (a == "--merge-forward") merge_f = std::atoi(need_val(i));
        else if (a == "--dtype") ecfg.dtype = need_val(i);
        else if (a == "--lane-mode") ecfg.lane_mode = need_val(i);
        else if (a == "--trapezoid") ecfg.trapezoid = true;
        else if (a == "--shard") ecfg.shards = std::atoi(need_val(i));
        else if (a == "--vfuse") ecfg.vfuse = true;
        else if (a == "--jfix") ecfg.jfix = need_val(i);
        else if (a == "--block") ecfg.block = std::atoi(need_val(i));
        else if (a == "--check") ecfg.check = true;
        else if (a == "--gold") ecfg.gold_only = true;
        else if (a == "--dump-analysis") dump = true;
        else {
            std::cout << "Illegal input: unknown option " << a << std::endl;
            return -1;
        }
    }
    if (ecfg.dtype != "float32" && ecfg.dtype != "bfloat16") {
        std::cout << "Illegal input: --dtype must be float32 or bfloat16"
                  << std::endl;
        return -1;
    }

    try {
        drs::Spec spec = drs::load_stc(argv[argc - 1]);
        if (is3d && spec.ndim() != 3) {
            std::cout << "--3d given but " << spec.name
                      << ".stc has no L dimension" << std::endl;
            return -1;
        }
        if (ecfg.shards > 0) {
            // shard mode: the kernel geometry is the per-shard problem
            // (the analysis itself is dims-independent); the emitter
            // reconstructs the global dims as local*shards
            if (spec.dims[0] % ecfg.shards) {
                std::cout << "Illegal input: leading dim " << spec.dims[0]
                          << " not divisible by --shard " << ecfg.shards
                          << std::endl;
                return -1;
            }
            spec.dims[0] /= ecfg.shards;
        }
        drs::Analysis an = drs::analyze(spec, step, distance, merge_f);

        if (dump) {
            std::cout << drs::to_json(an) << std::endl;
            return 0;
        }

        std::ostringstream cli;
        for (int i = 1; i < argc; ++i) cli << (i > 1 ? " " : "") << argv[i];
        std::string program = drs::emit_program(an, ecfg, cli.str());

        std::ofstream out(out_name, std::ios::trunc);
        if (!out) {
            std::cout << "Cannot open output file " << out_name << std::endl;
            return -1;
        }
        out << program;
        return 0;
    } catch (const std::exception& e) {
        std::cout << e.what() << std::endl;
        return 1;
    }
}
