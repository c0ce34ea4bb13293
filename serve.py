"""Serving daemon: persistent full-volume decode over a watched directory.

The reference's deployment story is one ``test.py`` run per volume
(reference test.py:38-218 decodes a single hard-coded image). On TPU that
shape is wrong: every fresh process pays the device claim (minutes on a
pooled chip) plus the decode compile before its first volume. serve.py
keeps ONE process resident — checkpoint restored once, decode executable
compiled once — and drains volumes as they arrive:

    python serve.py --watch in_dir --result out_dir \
        --checkpoints_dir ./checkpoints --name myrun --model_suffix _A

Each ``.nii``/``.nii.gz`` appearing in ``--watch`` is decoded into
``--result`` under the same filename. Robustness rules:

- a file is only picked up once its (size, mtime) is identical across two
  consecutive scans — half-copied uploads never reach the decoder; and a
  file whose content CHANGES after being served (a re-upload, or a copy
  that stalled long enough to look stable and then completed) is served
  again once it re-stabilizes — "done" is a per-signature fact, not a
  per-name one;
- results are written atomically (hidden temp name in the result dir, then
  ``os.replace``) so downstream watchers never see partial NIfTIs;
- host IO overlaps the device decode exactly like ``test.py --image <dir>``
  (thread-prefetched reads, async writes);
- a failed volume is logged and skipped (its name goes to
  ``<result>/failed.log``); the daemon keeps serving;
- ``--once`` drains what is present and exits (batch mode with serve
  semantics); otherwise the loop runs until ``--stop_file`` appears or
  SIGINT.
"""
from __future__ import annotations

import itertools
import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from mra_gan_tpu.data import nifti
from mra_gan_tpu.options import TestOptions

# Transient (device/runtime) decode failures are retried this many times per
# (name, signature) before the signature is retired for good. Load/parse
# failures are permanent immediately — re-reading corrupt bytes cannot help.
MAX_DECODE_ATTEMPTS = 3


class ServeOptions(TestOptions):
    def initialize(self, parser):
        parser = TestOptions.initialize(self, parser)
        parser.add_argument("--watch", type=str, required=True,
                            help="directory to watch for input volumes")
        parser.add_argument("--poll_secs", type=float, default=2.0,
                            help="directory scan interval")
        parser.add_argument("--once", action="store_true",
                            help="drain the volumes currently present, "
                                 "then exit")
        parser.add_argument("--stop_file", type=str, default="",
                            help="path whose appearance stops the daemon "
                                 "cleanly (checked every poll)")
        return parser


_tmp_counter = itertools.count()


def _atomic_save(result, path: Path) -> None:
    # hidden temp name KEEPS the real suffix (the writer picks gzip from
    # it), same directory so os.replace is atomic on the same filesystem.
    # The monotonic counter makes the tmp path unique even when the SAME
    # output target is written twice in quick succession (a re-served file
    # whose previous save is still pending) — pid alone is constant per
    # process, so two concurrent writers would otherwise share one tmp path
    # and os.replace could promote an interleaved half-write.
    tmp = path.parent / f".tmp-{os.getpid()}-{next(_tmp_counter)}-{path.name}"
    try:
        nifti.save(result, tmp)
        os.replace(tmp, path)
    except BaseException:
        tmp.unlink(missing_ok=True)
        raise


def _scan(watch: Path) -> dict:
    out = {}
    for p in watch.iterdir():
        if p.name.startswith("."):
            continue  # hidden files: editors' swap files, our own .tmp-*
        if p.name.endswith((".nii", ".nii.gz")) and p.is_file():
            try:
                st = p.stat()
            except OSError:  # deleted between iterdir/is_file and stat —
                continue     # the daemon must outlive cleanup jobs
            out[p.name] = (st.st_size, st.st_mtime)
    return out


def _ready(cur: dict, prev: dict, done: dict) -> list:
    """Names to serve this poll: signature stable across two consecutive
    scans AND that signature not already served. Keying ``done`` on the
    signature (not the name) means a file that changes after being served —
    a re-upload, or a copy that stalled long enough to pass the stability
    gate and then completed — is served again once it re-stabilizes."""
    return sorted(n for n, sig in cur.items()
                  if prev.get(n) == sig and done.get(n) != sig)


def _drained(cur: dict, done: dict) -> bool:
    """--once exit test: everything currently present has been served at its
    current signature (files still settling keep the loop polling)."""
    return all(done.get(n) == sig for n, sig in cur.items())


def main(argv=None):
    opt = ServeOptions().parse(argv)
    from mra_gan_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import argparse

    import test as test_cli

    watch = Path(opt.watch)
    out_dir = Path(opt.result)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not watch.is_dir():
        raise SystemExit(f"--watch {watch} is not a directory")
    if watch.resolve() == out_dir.resolve():
        # our own outputs (and in-flight .tmp partials) would match the scan
        # and feed the decoder in an endless self-decode loop
        raise SystemExit("--watch and --result must be different directories")
    stop_file = Path(opt.stop_file) if opt.stop_file else None
    failed_log = out_dir / "failed.log"

    loaded = test_cli.load_generator(opt)
    done: dict = {}  # name -> signature served (see _ready)
    prev: dict = {}
    attempts: dict = {}  # (name, signature) -> transient decode failures
    served = failures = 0
    print(f"serving {watch} -> {out_dir} "
          f"({'drain once' if opt.once else f'poll every {opt.poll_secs}s'})",
          flush=True)
    with ThreadPoolExecutor(max_workers=2) as io_pool:
        save_futures = []

        def finish_save(entry) -> None:
            nonlocal served, failures
            res_path, t_start, fut = entry
            name = Path(res_path).name
            try:
                fut.result()
                served += 1
                print(f"served {name} "
                      f"({time.perf_counter() - t_start:.2f}s)",
                      flush=True)
            except Exception as e:  # write failure
                failures += 1
                print(f"FAILED WRITE {name}: {e}", flush=True)
                with open(failed_log, "a") as f:
                    f.write(f"{name}\twrite\t{e}\n")

        def drain_saves(block: bool, max_pending: int = 4) -> None:
            remaining = []
            for entry in save_futures:
                if not block and not entry[2].done():
                    remaining.append(entry)
                    continue
                finish_save(entry)
            # backpressure: each pending write holds a full float volume, so
            # never let the queue outrun the 2-thread writer — block on the
            # oldest instead of accumulating
            while not block and len(remaining) > max_pending:
                finish_save(remaining.pop(0))
            save_futures[:] = remaining

        def settle_saves_for(res_path: str) -> None:
            # Serialize writes per output target: before re-serving a name
            # whose previous save is still pending, block on that save so a
            # stale (older-signature) write can never finish after — and
            # clobber — the fresh result.
            keep = []
            for entry in save_futures:
                if entry[0] == res_path:
                    finish_save(entry)
                else:
                    keep.append(entry)
            save_futures[:] = keep

        stopping = False
        try:
            while not stopping:
                cur = _scan(watch)
                # prune names no longer present: bounds `done` in a
                # long-running daemon, and a file deleted then later restored
                # (even with identical size+mtime, e.g. mv'd back) is served
                # again instead of being silently skipped forever
                done = {n: sig for n, sig in done.items() if n in cur}
                attempts = {k: v for k, v in attempts.items() if k[0] in cur}
                ready = _ready(cur, prev, done)
                prev = cur
                read_fut = None  # prefetched nifti.load of the CURRENT name
                for i, name in enumerate(ready):
                    # re-check the stop file between volumes: a large backlog
                    # would otherwise fully drain before the next poll-level
                    # check, making --stop_file latency unbounded
                    if stop_file is not None and stop_file.exists():
                        print("stop file found, exiting", flush=True)
                        stopping = True
                        break
                    sig = cur[name]
                    done[name] = sig
                    sub = argparse.Namespace(**vars(opt))
                    sub.image = str(watch / name)
                    sub.result = str(out_dir / name)
                    t_start = time.perf_counter()
                    # overlap the NEXT file's host read with this one's
                    # device decode (same shape as test.py's directory mode —
                    # the read is pure host IO and the decode releases the
                    # GIL on waits)
                    nxt = (io_pool.submit(nifti.load,
                                          str(watch / ready[i + 1]))
                           if i + 1 < len(ready) else None)
                    try:
                        img = (read_fut.result() if read_fut is not None
                               else nifti.load(sub.image))
                    except Exception as e:
                        # load/parse failure: permanent for this signature —
                        # re-reading corrupt bytes cannot succeed later
                        failures += 1
                        print(f"FAILED {name}: {e}", flush=True)
                        with open(failed_log, "a") as f:
                            f.write(f"{name}\tdecode\t{e}\n")
                        read_fut = nxt
                        continue
                    try:
                        result = test_cli.inference(sub, loaded, img=img,
                                                    save=False)
                        settle_saves_for(sub.result)
                        save_futures.append(
                            (sub.result, t_start, io_pool.submit(
                                _atomic_save, result, Path(sub.result))))
                        attempts.pop((name, sig), None)
                    except Exception as e:
                        # decode/runtime failure: often transient on this
                        # backend (tunnel drop, pool UNAVAILABLE window) —
                        # un-retire the signature so the next poll retries,
                        # up to MAX_DECODE_ATTEMPTS
                        failures += 1
                        n_try = attempts.get((name, sig), 0) + 1
                        attempts[(name, sig)] = n_try
                        retry = n_try < MAX_DECODE_ATTEMPTS
                        if retry:
                            del done[name]
                        print(f"FAILED {name} (attempt {n_try}"
                              f"{', will retry' if retry else ', giving up'}"
                              f"): {e}", flush=True)
                        with open(failed_log, "a") as f:
                            f.write(f"{name}\tdecode\t{e}\n")
                    read_fut = nxt
                    drain_saves(block=False)
                if stopping:
                    break
                if opt.once and _drained(cur, done):
                    break
                if stop_file is not None and stop_file.exists():
                    print("stop file found, exiting", flush=True)
                    break
                if not ready:
                    # idle polls still surface finished/failed writes —
                    # without this a disk-full failure would go unlogged
                    # until the NEXT file arrived
                    drain_saves(block=False)
                    time.sleep(opt.poll_secs)
        except KeyboardInterrupt:
            # SIGINT is the documented stop mechanism: still drain pending
            # writes so their outcomes (incl. failures) are logged, and
            # still print the summary
            print("interrupted — draining pending writes", flush=True)
        drain_saves(block=True)
    print(f"served {served} volume(s), {failures} failure(s)", flush=True)
    return served, failures


if __name__ == "__main__":
    main()
