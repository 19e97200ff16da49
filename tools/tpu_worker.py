"""Long-lived TPU worker: executes queued python job files in-process.

Submit work by writing /tmp/tpu_jobs/<name>.py; output goes to
/tmp/tpu_jobs/<name>.out (stdout+stderr+traceback), and an empty
<name>.done marker is written when finished. Jobs share the process's JAX
state, so compiled functions stay cached between jobs and the single axon
TPU claim is held continuously.
"""
import io, os, sys, time, traceback, contextlib
from pathlib import Path

JOBS = Path("/tmp/tpu_jobs")
JOBS.mkdir(exist_ok=True)

# Clear stale markers from a previous (crashed) worker incarnation.
for stale in JOBS.glob("*.running"):
    stale.unlink()

import jax
print("worker up:", jax.devices(), flush=True)
(JOBS / "WORKER_READY").write_text("ok")

SHARED: dict = {}
IDLE_EXIT_SECS = 1200  # release the TPU claim if no jobs arrive
last_activity = time.time()

while True:
    pys = sorted(p for p in JOBS.glob("*.py") if not (JOBS / (p.stem + ".done")).exists() and not (JOBS / (p.stem + ".running")).exists())
    if not pys:
        if time.time() - last_activity > IDLE_EXIT_SECS:
            print("worker: idle timeout; releasing the TPU", flush=True)
            (JOBS / "WORKER_READY").unlink(missing_ok=True)
            sys.exit(0)
        time.sleep(2)
        continue
    last_activity = time.time()
    job = pys[0]
    (JOBS / (job.stem + ".running")).write_text("")
    buf = io.StringIO()
    t0 = time.time()
    try:
        # Reload repo modules so jobs always see the current source (jax
        # and its compile caches stay warm).
        for name in [m for m in sys.modules if m.startswith("pixelsplat_tpu")]:
            del sys.modules[name]
        code = job.read_text()
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            glb = {"SHARED": SHARED, "__name__": "__tpu_job__"}
            exec(compile(code, str(job), "exec"), glb)
        status = "OK"
    except BaseException:
        buf.write("\n" + traceback.format_exc())
        status = "FAIL"
    out = f"[{status} {time.time()-t0:.1f}s]\n" + buf.getvalue()
    (JOBS / (job.stem + ".out")).write_text(out)
    (JOBS / (job.stem + ".done")).write_text(status)
    (JOBS / (job.stem + ".running")).unlink(missing_ok=True)
    print(f"job {job.stem}: {status} {time.time()-t0:.1f}s", flush=True)
    if "TPU backend error" in out:
        # The runtime is poisoned after an internal error; restart the
        # process (the launcher loop brings us back).
        print("worker: TPU runtime poisoned; exiting for restart", flush=True)
        sys.exit(3)
