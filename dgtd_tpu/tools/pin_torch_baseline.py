"""Pin the REAL PyTorch-CPU baseline for bench.py's ``vs_baseline``.

Runs the reference torch network itself (/root/reference/twig/model/cod.py
via dgtd_tpu.tools.ref_oracle stubs) — not our own framework on CPU — and
writes images/sec with provenance to bench_baseline.json. This is the
denominator BASELINE.json's north star asks for ("≥5× the PyTorch CPU
baseline images/sec/chip").

Resolution is 384²: the reference hard-codes 384 in MessagePassing
(cod.py:1186 ``F.interpolate(x, size=(self.img_size,self.img_size))`` with
img_size=384 at cod.py:1236) and its forward raises a shape error at any
other input size, so 384² is the only resolution at which a reference
baseline exists.

Usage: python -m dgtd_tpu.tools.pin_torch_baseline [--batch 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--size", type=int, default=384)
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "..", "bench_baseline.json"),
    )
    args = parser.parse_args(argv)

    import torch

    from dgtd_tpu.tools.ref_oracle import load_reference_cod

    ref = load_reference_cod()
    torch.manual_seed(0)
    model = ref.cod()
    model.eval()

    x = torch.randn(args.batch, 3, args.size, args.size)
    d = torch.rand(args.batch, 1, args.size, args.size)
    with torch.no_grad():
        model.hitnet(x, d)  # warmup (allocator, oneDNN jit)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            model.hitnet(x, d)
            times.append(time.perf_counter() - t0)
    best = min(times)
    ips = args.batch / best

    out = {
        "cpu_images_per_sec": ips,
        "config": f"reference torch Hitnet fp32 {args.size}^2 batch {args.batch}, best of {args.iters}",
        "provenance": (
            "REFERENCE PyTorch model (twig/model/cod.py Hitnet forward) on host CPU "
            f"({os.cpu_count()} core(s), {platform.processor() or 'x86_64'}), "
            f"torch {torch.__version__}, torch.get_num_threads()={torch.get_num_threads()}; "
            "384^2 because the reference's MessagePassing hard-codes img_size=384 "
            "(cod.py:1186,1236) and rejects other input sizes"
        ),
        "per_iter_seconds": times,
    }
    path = os.path.abspath(args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    print("wrote", path)


if __name__ == "__main__":
    main()
