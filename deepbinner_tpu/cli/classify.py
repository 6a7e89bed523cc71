"""`classify` workload: batch inference over a directory of fast5s.

Reference parity: ``deepbinner/classify.py::classify_fast5_files``
(SURVEY.md §3.1).  Output TSV goes to stdout (read_ID, barcode_call, and the
per-class probabilities when --verbose), progress to stderr — identical
plumbing to the reference so downstream `bin` invocations transfer.

Multi-host: when launched under `jax.distributed` (see
:mod:`deepbinner_tpu.parallel.dist`), each process classifies a deterministic
shard of the file list and host 0 prints the merged table.
"""

from __future__ import annotations

import contextlib
import os
import sys
from typing import List, Optional, Tuple

import numpy as np

from deepbinner_tpu.utils import table
from deepbinner_tpu.utils.fast5 import find_all_fast5s
from deepbinner_tpu.utils.log import Progress, log, quit_with_error, section


def _resolve_inputs(path: str) -> List[str]:
    if os.path.isdir(path):
        files = find_all_fast5s(path)
        if not files:
            quit_with_error(f"no fast5 files found in {path}")
        return files
    if os.path.isfile(path) and path.endswith(".fast5"):
        return [path]
    raise quit_with_error(f"{path} is neither a fast5 directory nor a fast5 file")


def build_program(args) -> Tuple[object, object]:
    """Load model(s) and compile the classify program from CLI args.

    Returns (ClassifyProgram, NetworkConfig).  Shared with `realtime`.
    """
    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram

    section("Loading models")
    model, start_vars, net_cfg, meta = load_model(args.start_model)
    log(f"  start model: {args.start_model} "
        f"(input {net_cfg.input_length}, kit {meta.get('kit', '?')})")
    end_vars = None
    end_model = None
    if args.end_model:
        end_model, end_vars, end_cfg, end_meta = load_model(args.end_model)
        if end_cfg != net_cfg:
            quit_with_error("start and end models have different architectures")
        log(f"  end model:   {args.end_model} (kit {end_meta.get('kit', '?')})")

    window = net_cfg.input_length
    scan_size = args.scan_size
    stride = max(window // 2, 1)
    if (scan_size - window) % stride != 0:
        # Round scan size up so the window grid tiles it exactly.
        scan_size = window + ((scan_size - window + stride - 1) // stride) * stride
        log(f"  scan size rounded to {scan_size} (window {window}, stride {stride})")
    pre = PreprocessConfig(
        scan_size=scan_size,
        window=window,
        stride=stride,
        trim_scan=min(2048, scan_size),
    )
    calling = CallingConfig(
        min_score=args.min_score,
        score_diff=args.score_diff,
        require_both=bool(getattr(args, "require_both", False)),
    )
    use_pallas = bool(getattr(args, "pallas", False))
    from deepbinner_tpu.models.network import NetworkConfig as _NetCfg

    if use_pallas and not isinstance(net_cfg, _NetCfg):
        log("  --pallas only supports native .dbt models; using the XLA path "
            "for this imported Keras graph")
        use_pallas = False
    cfg = ClassifyConfig(
        preprocess=pre, calling=calling, dual_model=end_vars is not None,
        use_pallas=use_pallas,
    )

    # Data-parallel over local devices: shard the batch axis of every input
    # over a ('data',) mesh; weights replicate; jit inserts the collectives.
    mesh = None
    device_count = int(getattr(args, "device_count", 0) or 0)
    import jax

    local = len(jax.devices())
    use_devices = device_count if device_count > 0 else local
    # The batch must divide evenly across the data axis; drop to the largest
    # device count that fits rather than erroring (a batch of 4 on 8 devices
    # just uses 4).
    while use_devices > 1 and args.batch_size % use_devices:
        use_devices -= 1
    if use_devices > 1:
        from deepbinner_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(jax.devices()[:use_devices])
        log(f"  data-parallel over {mesh.shape['data']} device(s)")

    # The end model brings its own graph object: imported Keras graphs
    # execute by layer name, so running end weights through the start graph
    # would crash (different auto-names) or silently misexecute.
    program = ClassifyProgram(model, cfg, start_vars, end_vars, mesh=mesh,
                              end_model=end_model)
    return program, net_cfg


def result_to_row(result, verbose: bool, dual: bool) -> str:
    call = table.class_index_to_call(result.call)
    if not verbose:
        return table.format_row(result.read_id, call)
    scores: List[float] = list(np.asarray(result.start_probs, dtype=np.float64))
    extra: List[str] = []
    if dual:
        extra = [
            table.class_index_to_call(result.start_call),
            table.class_index_to_call(result.end_call),
        ]
        scores += list(np.asarray(result.end_probs, dtype=np.float64))
    parts = [result.read_id, call] + extra + [f"{s:.4f}" for s in scores]
    return "\t".join(parts)


def classify_fast5_files(args) -> None:
    from deepbinner_tpu.parallel import dist
    from deepbinner_tpu.runner.executor import ExecutorStats, classify_files

    files = _resolve_inputs(args.input)
    shard = dist.shard_files(files)
    section(f"Classifying {len(files)} fast5 file(s)"
            + (f" (this host: {len(shard)})" if len(shard) != len(files) else ""))

    program, _ = build_program(args)
    read_fn = _select_read_fn(args)

    profile = contextlib.nullcontext()
    if getattr(args, "profile_dir", None):
        import jax
        profile = jax.profiler.trace(args.profile_dir)

    dual = program.cfg.dual_model
    stats = ExecutorStats()
    progress = Progress("reads classified")
    local_rows: List[Tuple[str, str]] = []
    verbose_rows: List[str] = []

    reader_processes = int(getattr(args, "reader_processes", 0) or 0)
    if reader_processes > 0:
        from deepbinner_tpu.runner.executor import classify_stream
        from deepbinner_tpu.runner.mp_reader import iter_signals_mp

        signals = iter_signals_mp(
            shard, num_workers=reader_processes, stats=stats,
            use_native=not getattr(args, "no_native_reader", False),
        )
        results = classify_stream(program, signals,
                                  batch_size=args.batch_size, stats=stats)
    else:
        results = classify_files(
            program, shard, batch_size=args.batch_size,
            num_readers=args.num_readers, stats=stats, read_fn=read_fn,
        )
    with profile:
        for result in results:
            local_rows.append(
                (result.read_id, table.class_index_to_call(result.call))
            )
            if args.verbose:
                verbose_rows.append(result_to_row(result, True, dual))
            progress.update()
    elapsed = progress.finish()
    if stats.failed_files:
        log(f"  skipped {stats.failed_files} unreadable file(s)")
    log(f"  throughput: {stats.reads / max(elapsed, 1e-9):.1f} reads/s (this host)")

    if args.verbose:
        # Verbose tables are per-host (score columns are diagnostic).
        print(table.header_line(True, dual))
        for row in sorted(verbose_rows):
            print(row)
    else:
        merged = dist.merge_call_tables(local_rows)
        if dist.should_emit_table():
            print(table.header_line(False, dual))
            for read_id, call in merged:
                print(table.format_row(read_id, call))
    sys.stdout.flush()


def _select_read_fn(args):
    from deepbinner_tpu.runner.executor import _default_read_fn

    wants_native = getattr(args, "native_reader", False)
    no_native = getattr(args, "no_native_reader", False)
    if not no_native:
        from deepbinner_tpu.native import fast5_reader

        if fast5_reader.available():
            log("  using native C++ fast5 reader")
            return fast5_reader.read_file
        if wants_native:
            log("  native reader not built; falling back to h5py "
                "(build: python -m deepbinner_tpu.native.build)")
    return _default_read_fn
