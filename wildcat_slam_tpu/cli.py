"""Command-line odometry driver — the wildcat_slam_node equivalent.

Reference: src/wildcat_slam_node.cc (gflags: --enable_online_mode,
--bag_filename, --imu_rate; offline mode iterates the bag and dispatches to the
odometry callbacks). Here:

    python -m wildcat_slam_tpu.cli --dataset DIR | --bag FILE.bag [--traj-out
        traj.tum] [--surfels-out surfels.ply] [--cloud-out cloud.ply]
        [--imu-rate 200] [--synthetic SECONDS] [--profile DIR] [--device cpu]

ROS1 bags are read natively (io/rosbag.py) — the reference's Hilti bags work
unchanged: --bag exp04.bag --imu-topic /alphasense/imu --lidar-topic /hesai/pandar.

With --synthetic N a synthetic sequence is generated in memory instead of
reading --dataset (useful for smoke runs and benchmarking without data).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _batch_events(spec: str, imu_topic, lidar_topic):
    """One segment source for --batch: dataset dir | .bag |
    'synthetic:SECONDS[:GEOMETRY[:SEED]]'."""
    if spec.split(":")[0] == "synthetic":
        parts = spec.split(":")
        dur = float(parts[1]) if len(parts) > 1 else 8.0
        geom = parts[2] if len(parts) > 2 else "room"
        seed = int(parts[3]) if len(parts) > 3 else 0
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(duration=dur, points_per_scan=6000, room_half=5.0,
                                geometry=geom, seed=seed)

        def gen():
            i_imu = 0
            for times, pts in seq.scans:
                while i_imu < len(seq.imu) and seq.imu[i_imu][0] <= times[-1] + 0.01:
                    yield ("imu", *seq.imu[i_imu])
                    i_imu += 1
                yield ("scan", times, pts)

        return gen()
    if spec.endswith(".bag"):
        from wildcat_slam_tpu.io.rosbag import read_bag

        return read_bag(spec, imu_topic, lidar_topic)
    from wildcat_slam_tpu.io.dataset import Dataset

    return Dataset(spec)


def _run_batch(args, cfg) -> int:
    """--batch driver: B segments in lockstep through the sharded step."""
    import jax

    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    specs = [s.strip() for s in args.batch.split(",") if s.strip()]
    for s in specs:
        if s.split(":")[0] != "synthetic" and not os.path.exists(s):
            print(f"--batch: no such source: {s}", file=sys.stderr)
            return 2
    if args.resume:
        from wildcat_slam_tpu.odometry import checkpoint

        # --resume takes the base path given to --checkpoint-out (expands to
        # the .w{i} per-window files) or an explicit comma-separated list
        if "," in args.resume:
            paths = [p.strip() for p in args.resume.split(",") if p.strip()]
        else:
            paths = checkpoint.batch_paths(args.resume, len(specs))
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            print(f"--resume: missing batch checkpoint files: {missing}",
                  file=sys.stderr)
            return 2
        if len(paths) != len(specs):
            print(f"--resume: {len(paths)} checkpoint files for {len(specs)} "
                  "--batch sources", file=sys.stderr)
            return 2
        bo = checkpoint.load_batch(paths,
                                   use_native=True if args.native else None)
        cfg = bo.cfg  # the checkpoints' config wins, like single-window resume
    else:
        bo = BatchedOdometry(cfg, batch=len(specs), use_native=args.native)
    print(f"batch: {len(specs)} windows over a {bo.mesh.devices.size}-device "
          f"mesh ({jax.devices()[0].platform})", file=sys.stderr)

    # iter() is load-bearing: Dataset (directory sources) is an iterABLE whose
    # __iter__ restarts from the first scan — re-entering `for ev in it` each
    # feed round would re-feed scan 0 forever and trip the add_scan time-order
    # contract. A persistent iterator keeps per-source position across rounds.
    its = [iter(_batch_events(s, args.imu_topic, args.lidar_topic)) for s in specs]
    live = [True] * len(its)
    sweeps0 = [w.sweep_id for w in bo.windows]  # nonzero when resuming
    seen = [len(w.stats) for w in bo.windows]  # per-window stats already shown
    ooo_dropped = {"imu": 0, "scan": 0}  # same quirk policy as single-window

    def feed(i, ev):
        # resume re-reads the SAME sources from the start: already-consumed
        # events carry timestamps behind the restored frontier and trip the
        # add_imu/add_scan time-order contract — drop-and-count them exactly
        # like the single-window CLI's field-quirk policy (--strict raises)
        try:
            if ev[0] == "imu":
                bo.add_imu(i, ev[1], ev[2], ev[3])
            else:
                bo.add_scan(i, ev[1], ev[2])
        except ValueError:
            if args.strict:
                raise
            ooo_dropped[ev[0]] += 1

    def report_new():
        if not args.verbose:
            return
        for i, w in enumerate(bo.windows):
            for st in w.stats[seen[i]:]:
                deg = (" DEGENERATE" if st["degenerate"] else "")
                print(
                    f"w{i} sweep {sweeps0[i] + seen[i] + 1}: "
                    f"surfels={int(st['n_new_surfels'])} "
                    f"pairs={int(st['n_pairs_sld'])}/{int(st['n_pairs_fix'])} "
                    f"iters={int(st['iterations'])} "
                    f"cost {float(st['initial_cost']):.3f}->"
                    f"{float(st['final_cost']):.3f} "
                    f"deg={float(st['deg_trans_ratio']):.3f}/"
                    f"{float(st['deg_rot_ratio']):.3f}{deg}",
                    file=sys.stderr)
                seen[i] += 1

    def hit_max():
        return args.max_sweeps and min(
            w.sweep_id - s0 for w, s0 in zip(bo.windows, sweeps0)) >= args.max_sweeps

    t0 = time.perf_counter()
    while any(live):
        for i, it in enumerate(its):
            if not live[i]:
                continue
            for ev in it:  # feed through the next scan of segment i
                feed(i, ev)
                if ev[0] == "scan":
                    break
            else:
                live[i] = False
        bo.pump()
        report_new()
        if hit_max():
            live = [False] * len(its)
            break
    if not hit_max():
        bo.finish()
        report_new()
    elapsed = time.perf_counter() - t0

    total = sum(w.sweep_id - s0 for w, s0 in zip(bo.windows, sweeps0))
    for i, w in enumerate(bo.windows):
        n_deg = sum(1 for s in w.stats if s.get("degenerate"))
        print(f"window {i}: {w.sweep_id} sweeps"
              + (f" ({w.sweep_id - sweeps0[i]} this run)" if sweeps0[i] else "")
              + (f", {n_deg} DEGENERATE" if n_deg else ""), file=sys.stderr)
    if ooo_dropped["imu"] or ooo_dropped["scan"]:
        print(f"dropped out-of-order: {ooo_dropped['imu']} imu, "
              f"{ooo_dropped['scan']} scans (resume replay and recorder "
              "quirks; --strict raises instead)", file=sys.stderr)
    print(f"batch total: {total} sweeps in {elapsed:.2f}s "
          f"({cfg.sweep_duration * total / max(elapsed, 1e-9):.2f}x real-time "
          "incl. compile, all windows)", file=sys.stderr)

    if args.checkpoint_out:
        from wildcat_slam_tpu.odometry import checkpoint

        paths = checkpoint.save_batch(args.checkpoint_out, bo)
        print(f"state checkpoints -> {', '.join(paths)}", file=sys.stderr)

    if args.traj_out:
        from wildcat_slam_tpu.io.trajectory import save_tum

        base, ext = os.path.splitext(args.traj_out)
        for i, w in enumerate(bo.windows):
            if w.trajectory:
                save_tum(f"{base}_w{i}{ext or '.tum'}", w.trajectory)
        print(f"trajectories -> {base}_w*.{(ext or '.tum').lstrip('.')}",
              file=sys.stderr)
    if args.surfels_out:
        from wildcat_slam_tpu.viz.surfel_export import save_surfels_ply

        base, ext = os.path.splitext(args.surfels_out)
        for i, w in enumerate(bo.windows):
            sld_i = jax.tree_util.tree_map(lambda x, i=i: x[i], bo.state.sld)
            save_surfels_ply(f"{base}_w{i}{ext or '.ply'}", sld_i)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Wildcat-TPU lidar-inertial odometry")
    ap.add_argument("--dataset", help="sequence directory (imu.npz + scans/*.wcs)")
    ap.add_argument("--bag", help="ROS1 .bag file (sensor_msgs/Imu + PointCloud2)")
    ap.add_argument("--imu-topic", default=None, help="bag IMU topic (default: any Imu)")
    ap.add_argument("--lidar-topic", default=None, help="bag lidar topic (default: any PointCloud2)")
    ap.add_argument("--synthetic", type=float, default=None, metavar="SECONDS",
                    help="run on a generated synthetic sequence instead of a dataset")
    ap.add_argument("--synthetic-geometry", default="room",
                    choices=["room", "cylinder", "ramp"],
                    help="synthetic world for --synthetic (cylinder and ramp "
                         "without doors are degenerate scenes — useful for "
                         "exercising the health signal)")
    ap.add_argument("--synthetic-door-spacing", type=float, default=0.0,
                    metavar="M", help="doorway spacing for --synthetic-geometry "
                                      "ramp (0 = bare corridor)")
    ap.add_argument("--batch", default=None, metavar="SRC1,SRC2,...",
                    help="process B independent segments in lockstep through "
                         "the sharded multi-window step (parallel/batch.py; "
                         "one device mesh shard per window). Each SRC is a "
                         "dataset dir, a .bag file, or 'synthetic:SECONDS"
                         "[:GEOMETRY[:SEED]]'. --traj-out FILE.tum writes "
                         "FILE_w0.tum, FILE_w1.tum, ...")
    ap.add_argument("--stream", default=None, metavar="SRC",
                    help="run LIVE from a framed sensor stream (io/stream.py): "
                         "'-' = stdin, 'tcp:HOST:PORT', or a FIFO/file path; "
                         "reports per-sweep latency at exit")
    ap.add_argument("--stream-imu-queue", type=int, default=100000, metavar="N",
                    help="bounded IMU queue for --stream (drop-oldest when the "
                         "consumer lags, mirroring the reference's ROS bound; "
                         "0 = unbounded IMU queue — memory grows with backlog. "
                         "Producer backpressure applies only when BOTH queue "
                         "bounds are 0)")
    ap.add_argument("--stream-scan-queue", type=int, default=512, metavar="N",
                    help="bounded scan queue for --stream (drop-oldest; "
                         "0 = unbounded scan queue — memory grows with backlog. "
                         "Producer backpressure applies only when BOTH queue "
                         "bounds are 0)")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the pre-stream jit warmup (stream mode compiles "
                         "on the first live sweep instead)")
    ap.add_argument("--snapshot-every", type=int, default=None, metavar="N",
                    help="incremental export every N sweeps: numbered surfel "
                         "PLYs next to --surfels-out and a rewritten --traj-out "
                         "(the live-viewer analog of the reference's per-sweep "
                         "rviz publishing)")
    ap.add_argument("--viewer-port", type=int, default=None, metavar="PORT",
                    help="serve a live in-browser 3D viewer on this port "
                         "(trajectory + surfel ellipsoids, viz/live.py; "
                         "0 picks a free port). Watchable during --stream or "
                         "offline replay — the rviz-channel equivalent")
    ap.add_argument("--viewer-surfels-every", type=int, default=5, metavar="N",
                    help="refresh the viewer's surfel layer every N sweeps "
                         "(pose/trajectory refresh every sweep)")
    ap.add_argument("--imu-rate", type=float, default=200.0)
    ap.add_argument("--traj-out", default=None, help="write trajectory (TUM format)")
    ap.add_argument("--surfels-out", default=None, help="write final sliding-window surfels (PLY)")
    ap.add_argument("--cloud-out", default=None, help="write accumulated undistorted cloud (PLY)")
    ap.add_argument("--profile", default=None, help="capture a jax.profiler trace to this dir")
    ap.add_argument("--device", choices=["default", "cpu"], default="default")
    ap.add_argument("--native", action="store_true",
                    help="use the C++ host feeder (native/feeder.cc)")
    ap.add_argument("--chunk-sweeps", type=int, default=1, metavar="K",
                    help="offline replay: run K sweeps per device dispatch "
                         "(lax.scan chain), amortizing the host<->device "
                         "round-trip K-fold — through the TPU tunnel that "
                         "round-trip is ~2/3 of per-sweep wall time. "
                         "Incompatible with --stream (adds K sweeps of "
                         "latency) and per-sweep readers (--cloud-out, "
                         "--residual-hist, --viewer-port, --snapshot-every, "
                         "--verbose)")
    ap.add_argument("--max-sweeps", type=int, default=None)
    ap.add_argument("--residual-hist", action="store_true",
                    help="print pre/post-solve residual histograms per sweep")
    ap.add_argument("--exact-knn", action="store_true",
                    help="exact top-k correspondence search instead of approx_max_k")
    ap.add_argument("--degeneracy-remap", action="store_true",
                    help="ACT on the degeneracy health signal: project each "
                         "solver step's common-mode component off the "
                         "unobserved directions (Zhang & Singh ICRA'16 "
                         "solution remapping) so the pose dead-reckons on IMU "
                         "there instead of random-walking on lidar noise. "
                         "Exact no-op on healthy scenes")
    ap.add_argument("--checkpoint-out", default=None, metavar="NPZ",
                    help="save full odometry state at exit (resume with --resume)")
    ap.add_argument("--resume", default=None, metavar="NPZ",
                    help="resume from a --checkpoint-out file (its config wins)")
    ap.add_argument("--strict", action="store_true",
                    help="abort on out-of-order sensor messages instead of "
                         "dropping them (the library contract; the CLI default "
                         "tolerates real-world bag quirks with counted drops)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.odometry.pipeline import LidarOdometry
    from wildcat_slam_tpu.utils.profiling import StageTimer, trace

    if args.batch:
        if args.stream or args.cloud_out:
            ap.error("--batch is incompatible with --stream/--cloud-out "
                     "(per-window clouds and live streams stop at the batch "
                     "boundary; checkpoint/resume and --verbose work)")
        cfg = WildcatConfig(imu_rate=args.imu_rate,
                            match_knn_approx=not args.exact_knn,
                            degeneracy_remap=args.degeneracy_remap)
        return _run_batch(args, cfg)

    if args.resume:
        from wildcat_slam_tpu.odometry import checkpoint

        if not os.path.exists(args.resume):
            ap.error(f"--resume: no such file: {args.resume}")
        if args.cloud_out or args.exact_knn:
            print("warning: --cloud-out/--exact-knn are ignored with "
                  "--resume (the checkpoint's config wins)", file=sys.stderr)
        # feeder kind follows the checkpoint unless --native is passed explicitly
        lo = checkpoint.load(args.resume, use_native=True if args.native else None)
        cfg = lo.cfg
    else:
        cfg = WildcatConfig(imu_rate=args.imu_rate, debug_residuals=args.residual_hist,
                            match_knn_approx=not args.exact_knn,
                            degeneracy_remap=args.degeneracy_remap)
        if args.chunk_sweeps > 1:
            bad = [f for f, on in (("--stream", args.stream is not None),
                                   ("--cloud-out", bool(args.cloud_out)),
                                   ("--residual-hist", args.residual_hist),
                                   ("--viewer-port", args.viewer_port is not None),
                                   ("--snapshot-every", bool(args.snapshot_every)),
                                   ("--verbose", args.verbose)) if on]
            if bad:
                ap.error(f"--chunk-sweeps > 1 is incompatible with "
                         f"{', '.join(bad)} (per-sweep outputs/latency)")
        lo = LidarOdometry(cfg, collect_clouds=args.cloud_out is not None,
                           use_native=args.native,
                           chunk_sweeps=max(args.chunk_sweeps, 1))
    timer = StageTimer()

    stream_reader = None  # BoundedQueueReader when --stream runs bounded

    def events():
        nonlocal stream_reader
        if args.stream is not None:
            from wildcat_slam_tpu.io.stream import (BoundedQueueReader,
                                                    open_source, read_stream)

            src = open_source(args.stream)
            if args.stream_imu_queue > 0 or args.stream_scan_queue > 0:
                # a 0 bound for ONE type means that queue is truly unbounded
                # (no drop check, io/stream.py); backpressure only if both 0
                stream_reader = BoundedQueueReader(
                    src,
                    imu_queue=args.stream_imu_queue,
                    scan_queue=args.stream_scan_queue)
                yield from stream_reader
            else:  # both 0: plain blocking reads, producer backpressure
                yield from read_stream(src)
        elif args.synthetic is not None:
            from wildcat_slam_tpu.io.synthetic import SyntheticSequence

            seq = SyntheticSequence(duration=args.synthetic, points_per_scan=6000,
                                    room_half=5.0, geometry=args.synthetic_geometry,
                                    door_spacing=args.synthetic_door_spacing)
            i_imu = 0
            for times, pts in seq.scans:
                while i_imu < len(seq.imu) and seq.imu[i_imu][0] <= times[-1] + 0.01:
                    yield ("imu", *seq.imu[i_imu])
                    i_imu += 1
                yield ("scan", times, pts)
        elif args.bag:
            from wildcat_slam_tpu.io.rosbag import read_bag

            if not os.path.exists(args.bag):
                ap.error(f"--bag: no such file: {args.bag}")
            yield from read_bag(args.bag, args.imu_topic, args.lidar_topic)
        else:
            if not args.dataset:
                ap.error("need --dataset, --bag, --synthetic, or --stream")
            from wildcat_slam_tpu.io.dataset import Dataset

            if not os.path.isdir(args.dataset):
                ap.error(f"--dataset: no such directory: {args.dataset}")
            yield from Dataset(args.dataset)

    if args.stream is not None and not args.no_warmup:
        # live mode: compile the per-sweep program BEFORE consuming the stream
        # (first-sweep compile would otherwise back the stream up by ~30 s);
        # a throwaway pipeline with the same config populates the jit cache
        t_w = time.perf_counter()
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence

        warm = LidarOdometry(cfg, use_native=args.native)
        wseq = SyntheticSequence(duration=1.2, points_per_scan=2000, room_half=5.0)
        i_w = 0
        for times, pts in wseq.scans:
            while i_w < len(wseq.imu) and wseq.imu[i_w][0] <= times[-1] + 0.01:
                warm.add_imu(*wseq.imu[i_w])
                i_w += 1
            warm.add_scan(times, pts)
            if warm.sweep_id >= 1:
                break
        warm.trajectory  # flush
        del warm
        print(f"warmup: per-sweep program compiled in {time.perf_counter()-t_w:.1f}s",
              file=sys.stderr)

    viewer = None
    if args.viewer_port is not None:
        from wildcat_slam_tpu.viz.live import LiveViewer

        viewer = LiveViewer(args.viewer_port)
        print(f"live viewer: http://localhost:{viewer.port}/", file=sys.stderr)

    sweeps0 = lo.sweep_id  # nonzero when resuming; counters below are per-run
    latencies = []  # stream mode: scan-receipt -> pose-available, per sweep

    def snapshot():
        if args.surfels_out:
            from wildcat_slam_tpu.viz.surfel_export import save_surfels_ply

            base, ext = os.path.splitext(args.surfels_out)
            save_surfels_ply(f"{base}_{lo.sweep_id:06d}{ext or '.ply'}", lo.state.sld)
        if args.traj_out:
            from wildcat_slam_tpu.io.trajectory import save_tum

            save_tum(args.traj_out, lo.trajectory)

    # Field-quirk policy (documented; tests/test_rosbag.py::TestFieldQuirks):
    # real bags contain occasional duplicate/backward IMU stamps and late
    # scans (recorder races, chunk reordering). The LIBRARY keeps its hard
    # ValueError — time order is the add_imu/add_scan contract — while the
    # CLI, like the reference's ROS subscriber path which never aborts on a
    # late message, DROPS the offending message and counts it. --strict
    # restores the raise. Within-scan point disorder never reaches here: the
    # bag parser normalizes it by a stable per-message time sort
    # (io/rosbag.py _parse_pointcloud2), matching ROS drivers' semantics.
    ooo_dropped = {"imu": 0, "scan": 0}

    def feed(ev):
        kind = ev[0]
        try:
            if kind == "imu":
                lo.add_imu(ev[1], ev[2], ev[3])
            else:
                lo.add_scan(ev[1], ev[2])
        except ValueError:
            if args.strict:
                raise
            ooo_dropped[kind] += 1

    def run():
        t0 = time.perf_counter()
        for ev in events():
            if ev[0] == "imu":
                with timer.stage("imu"):
                    feed(ev)
            else:
                t_recv = time.perf_counter()
                before = lo.sweep_id
                with timer.stage("scan"):
                    feed(ev)
                if args.stream is not None and lo.sweep_id > before:
                    lo.trajectory  # force the deferred fetch: pose is now real
                    latencies.append(time.perf_counter() - t_recv)
                if (args.snapshot_every and lo.sweep_id > before
                        and lo.sweep_id % args.snapshot_every == 0):
                    snapshot()
                if viewer is not None and lo.sweep_id > before:
                    back_t, pos, _quat = lo.trajectory[-1]
                    surf = None
                    if lo.sweep_id % max(args.viewer_surfels_every, 1) == 0:
                        from wildcat_slam_tpu.viz.surfel_export import surfel_ellipsoids
                        surf = surfel_ellipsoids(lo.state.sld)
                    viewer.update(lo.sweep_id, float(back_t), pos, surf)
                if args.residual_hist and lo.sweep_id > before and lo.residuals:
                    from wildcat_slam_tpu.utils.histogram import residual_report
                    r = lo.residuals[-1]
                    print(residual_report("surfel pre ", r["surfel_pre"]), file=sys.stderr)
                    print(residual_report("surfel post", r["surfel"]), file=sys.stderr)
                    print(residual_report("imu-gyro pre ",
                                          np.linalg.norm(r["imu_pre"][:, 0:3], axis=1)),
                          file=sys.stderr)
                    print(residual_report("imu-gyro post",
                                          np.linalg.norm(r["imu"][:, 0:3], axis=1)),
                          file=sys.stderr)
                if args.verbose and lo.sweep_id > before:
                    st = lo.stats[-1]
                    deg = (" DEGENERATE" if st["degenerate"] else "")
                    print(
                        f"sweep {lo.sweep_id}: surfels={int(st['n_new_surfels'])} "
                        f"pairs={int(st['n_pairs_sld'])}/{int(st['n_pairs_fix'])} "
                        f"iters={int(st['iterations'])} "
                        f"cost {float(st['initial_cost']):.3f}->{float(st['final_cost']):.3f} "
                        f"deg={float(st['deg_trans_ratio']):.3f}/"
                        f"{float(st['deg_rot_ratio']):.3f}{deg}",
                        file=sys.stderr,
                    )
            if args.max_sweeps and lo.sweep_id - sweeps0 >= args.max_sweeps:
                break
        lo.flush_chunks()  # chunked mode: dispatch the partial tail chunk
        lo.trajectory      # materialize deferred fetches inside the timed run
        return time.perf_counter() - t0

    if args.profile:
        with trace(args.profile):
            elapsed = run()
    else:
        elapsed = run()

    n = lo.sweep_id - sweeps0
    if any(ooo_dropped.values()):
        print(f"WARNING: dropped {ooo_dropped['imu']} out-of-order IMU and "
              f"{ooo_dropped['scan']} out-of-order scan messages (duplicate or "
              "backward timestamps; --strict aborts instead)", file=sys.stderr)
    if stream_reader is not None and any(stream_reader.dropped.values()):
        d = stream_reader.dropped
        print(f"WARNING: stream overload — dropped {d['imu']} IMU and "
              f"{d['scan']} scan messages (oldest-first; queue bounds "
              f"{args.stream_imu_queue}/{args.stream_scan_queue}). The "
              "consumer could not keep up with the producer.", file=sys.stderr)
    n_deg = sum(1 for s in lo.stats if s.get("degenerate"))
    if n_deg:
        print(f"WARNING: {n_deg}/{len(lo.stats)} sweeps flagged DEGENERATE "
              f"(direction-coverage ratio < {cfg.degeneracy_warn_ratio}): the "
              "scene under-constrains some motion direction; poses may drift "
              "silently there (per-sweep ratios in stats deg_trans_ratio/"
              "deg_rot_ratio)", file=sys.stderr)
    print(f"{n} sweeps in {elapsed:.2f}s "
          f"({cfg.sweep_duration * n / max(elapsed, 1e-9):.2f}x real-time incl. compile)",
          file=sys.stderr)
    if latencies:
        lat = np.asarray(latencies)
        steady = lat[1:] if len(lat) > 1 else lat  # first sweep pays compile
        print(f"live latency (scan->pose): mean {steady.mean()*1e3:.1f} ms, "
              f"p95 {np.percentile(steady, 95)*1e3:.1f} ms, "
              f"max {steady.max()*1e3:.1f} ms over {len(lat)} sweeps "
              f"(first incl. compile: {lat[0]:.2f} s); "
              f"sub-sweep = < {cfg.sweep_duration*1e3:.0f} ms",
              file=sys.stderr)

    if args.checkpoint_out:
        from wildcat_slam_tpu.odometry import checkpoint

        checkpoint.save(args.checkpoint_out, lo)
        print(f"state checkpoint -> {args.checkpoint_out}", file=sys.stderr)
    if args.verbose:
        print(timer.report(), file=sys.stderr)

    if args.traj_out and lo.trajectory:
        from wildcat_slam_tpu.io.trajectory import save_tum

        save_tum(args.traj_out, lo.trajectory)
        print(f"trajectory ({len(lo.trajectory)} poses) -> {args.traj_out}", file=sys.stderr)
    if args.surfels_out:
        from wildcat_slam_tpu.viz.surfel_export import save_surfels_ply

        cnt = save_surfels_ply(args.surfels_out, lo.state.sld)
        print(f"{cnt} surfels -> {args.surfels_out}", file=sys.stderr)
    if args.cloud_out and lo.clouds:
        from wildcat_slam_tpu.viz.surfel_export import save_cloud_ply

        save_cloud_ply(args.cloud_out, np.concatenate(lo.clouds))
        print(f"cloud -> {args.cloud_out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
