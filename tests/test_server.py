"""HTTP serving front door (runtime/server.py) on the tiny synthetic model.

Real end-to-end: a ThreadingHTTPServer + TTSService over the
ContinuousBatcher, driven through actual HTTP requests; responses are
16-bit WAVs that must match the offline engine output exactly.
"""

import http.client
import json
import struct
import threading

import numpy as np
import pytest

from helpers import TINY_FLOWLM, TINY_MIMI, write_model_dir
from ptts_tpu import api
from ptts_tpu.io.wav import quantize_i16
from ptts_tpu.runtime import server as srv


@pytest.fixture(scope="module")
def httpd(tmp_path_factory):
    d = tmp_path_factory.mktemp("srvmodel")
    path, fw, mw = write_model_dir(d, seed=6)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    httpd = srv.serve(ctx, host="127.0.0.1", port=0, slots=2, max_len=96,
                      prefix_budget=32, max_num_steps=4)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd
    httpd.shutdown()
    httpd.tts_service.close()


def _post(httpd, payload):
    conn = http.client.HTTPConnection(*httpd.server_address, timeout=300)
    conn.request("POST", "/tts", json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), body


def _parse_wav(body):
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert body[36:40] == b"data"
    (nbytes,) = struct.unpack("<I", body[40:44])
    return np.frombuffer(body[44 : 44 + nbytes], "<i2")


def test_healthz_and_stats(httpd):
    conn = http.client.HTTPConnection(*httpd.server_address, timeout=60)
    conn.request("GET", "/healthz")
    assert conn.getresponse().read() == b"ok"
    conn.request("GET", "/stats")
    stats = json.loads(conn.getresponse().read())
    assert isinstance(stats, dict)
    # serving-pool observability block (round 5)
    srv_stats = stats["serving"]
    assert srv_stats["slots"] == 2
    assert srv_stats["queue_depth"] >= 0
    assert "phase_ms_per_step" in srv_stats
    conn.close()


@pytest.mark.slow
def test_tts_matches_offline(httpd):
    p = {"text": "hello world", "num_frames": 4, "num_steps": 1, "seed": 5,
         "temp": 0.5, "eos_enabled": False}
    status, ctype, body = _post(httpd, p)
    assert status == 200 and ctype == "audio/wav"
    got = _parse_wav(body)

    # offline reference: batcher seeds noise with seed + rid; this was the
    # first request, rid 0
    ctx = httpd.tts_service.ctx
    want = ctx.engine.generate(
        "hello world",
        params=api.Params(num_frames=4, num_steps=1, seed=5, temp=0.5,
                          eos_enabled=False),
    )
    want_i16 = quantize_i16(want.samples)
    # streaming-Mimi (batcher) vs whole-sequence decode differ at float
    # rounding; after 16-bit quantization that is at most 1 LSB
    diff = np.abs(got.astype(np.int32) - want_i16.astype(np.int32))
    assert diff.max() <= 1


def test_concurrent_requests(httpd):
    """More in-flight requests than slots, issued from parallel client
    threads; each response must be a valid WAV of the right length."""
    payloads = [
        {"text": t, "num_frames": f, "num_steps": 1, "seed": 50 + i,
         "eos_enabled": False}
        for i, (t, f) in enumerate(
            [("hello world", 3), ("how low", 4), ("hello hello", 2),
             ("world world", 5)])
    ]
    results = [None] * len(payloads)

    def worker(i):
        results[i] = _post(httpd, payloads[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    fs = TINY_MIMI.frame_samples
    for (status, ctype, body), p in zip(results, payloads):
        assert status == 200, body
        assert len(_parse_wav(body)) == p["num_frames"] * fs


@pytest.mark.slow
def test_k_frame_server_matches_offline(tmp_path):
    """The server's sustained-throughput operating point (frames_per_step>1,
    split-admit on by default) must serve byte-identical WAVs to K=1."""
    path, fw, mw = write_model_dir(tmp_path / "m", seed=6)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    httpd = srv.serve(ctx, host="127.0.0.1", port=0, slots=2, max_len=96,
                      prefix_budget=32, max_num_steps=4, frames_per_step=3)
    assert httpd.tts_service.batcher.split_admit  # auto-on: PCM pool, K>1
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        p = {"text": "hello world", "num_frames": 4, "num_steps": 1,
             "seed": 5, "temp": 0.5, "eos_enabled": False}
        status, ctype, body = _post(httpd, p)
        assert status == 200 and ctype == "audio/wav"
        got = _parse_wav(body)
        want = ctx.engine.generate(
            "hello world",
            params=api.Params(num_frames=4, num_steps=1, seed=5, temp=0.5,
                              eos_enabled=False))
        want_i16 = quantize_i16(want.samples)
        diff = np.abs(got.astype(np.int32) - want_i16.astype(np.int32))
        # streaming decode + the K-split jit boundaries: <=4 LSB (the
        # established K-variant bound in test_batching)
        assert diff.max() <= 4
    finally:
        httpd.shutdown()
        httpd.tts_service.close()


def _stream_raw(addr, payload):
    """POST /tts-stream and parse the chunked response at the wire level,
    returning (headers, list of data chunks) -- chunk boundaries are the
    incremental-delivery evidence http.client would hide."""
    import socket

    body = json.dumps(payload).encode()
    req = (b"POST /tts-stream HTTP/1.1\r\nHost: t\r\n"
           b"Content-Type: application/json\r\n"
           b"Content-Length: %d\r\n\r\n" % len(body)) + body
    with socket.create_connection(addr, timeout=300) as s:
        s.sendall(req)
        f = s.makefile("rb")
        status = f.readline()
        headers = {}
        while True:
            line = f.readline().strip()
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        chunks = []
        while True:
            n = int(f.readline().strip(), 16)
            if n == 0:
                f.readline()
                break
            chunks.append(f.read(n))
            assert f.read(2) == b"\r\n"
    return status, headers, chunks


@pytest.mark.slow
def test_tts_stream_incremental_pcm(tmp_path):
    """/tts-stream delivers s16le PCM in multiple HTTP chunks AS frames are
    produced, and the concatenation equals the offline engine's WAV data."""
    path, fw, mw = write_model_dir(tmp_path / "m", seed=6)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    httpd = srv.serve(ctx, host="127.0.0.1", port=0, slots=2, max_len=96,
                      prefix_budget=32, max_num_steps=4, frames_per_step=2)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        p = {"text": "hello world", "num_frames": 5, "num_steps": 1,
             "seed": 5, "temp": 0.5, "eos_enabled": False}
        status, headers, chunks = _stream_raw(httpd.server_address, p)
        assert b"200" in status
        assert headers[b"x-ptts-format"] == b"s16le"
        assert headers[b"transfer-encoding"] == b"chunked"
        fs = TINY_MIMI.frame_samples
        got = np.frombuffer(b"".join(chunks), "<i2")
        assert got.size == 5 * fs
        # incremental: more than one chunk, and every chunk is whole frames
        assert len(chunks) >= 2
        assert all(len(c) % (2 * fs) == 0 for c in chunks)
        # first request on a fresh server -> rid 0 -> offline seed matches
        want = ctx.engine.generate(
            "hello world",
            params=api.Params(num_frames=5, num_steps=1, seed=5, temp=0.5,
                              eos_enabled=False))
        want_i16 = quantize_i16(want.samples)
        diff = np.abs(got.astype(np.int32) - want_i16.astype(np.int32))
        assert diff.max() <= 4  # K-split jit-boundary bound
        assert not httpd.tts_service._streams  # subscription cleaned up
    finally:
        httpd.shutdown()
        httpd.tts_service.close()


def test_accept_backlog_raised(httpd):
    """Handler threads block on the batcher for whole utterances, so the
    listen backlog must exceed the stdlib default of 5 -- under 24
    closed-loop clients the kernel RSTs excess SYNs (measured 11/240
    resets in the round-5 HTTP bench)."""
    assert httpd.request_queue_size >= 64
    assert httpd.daemon_threads


def test_bad_request(httpd):
    status, _, body = _post(httpd, {"no_text": True})
    assert status == 400


def test_user_input_error_maps_to_400(httpd):
    """PttsError (over-budget prompt, bad params) is the client's fault:
    HTTP 400, not 500 (round-2 VERDICT serving polish)."""
    # prompt longer than the pool's prefix_budget=32 columns
    status, _, body = _post(httpd, {"text": "word " * 64, "num_frames": 2,
                                    "num_steps": 1, "seed": 1})
    assert status == 400, body
    assert b"prefix columns" in body
    # num_steps above the pool's max_num_steps=4
    status, _, body = _post(httpd, {"text": "hello", "num_steps": 9,
                                    "seed": 1})
    assert status == 400, body
    assert b"num_steps" in body


def test_step_error_releases_batcher_state(httpd):
    """A failing step errors the waiters AND releases chunks/slots/noise so
    the service keeps serving afterwards (round-2 ADVICE #1)."""
    service = httpd.tts_service
    b = service.batcher

    boom = RuntimeError("injected step failure")
    orig_step = b.step

    def failing_step():
        raise boom

    b.step = failing_step
    try:
        rid = service.submit("hello", params=api.Params(
            num_frames=2, num_steps=1, seed=3, eos_enabled=False))
        with pytest.raises(RuntimeError, match="injected step failure"):
            service.wait(rid, timeout=60)
    finally:
        b.step = orig_step
    assert rid not in b.chunks          # no leaked chunk buffer
    assert all(r is None for r in b.slot_req)
    assert not b.queue

    # service still serves after the failure
    status, _, body = _post(httpd, {"text": "hello again", "num_frames": 2,
                                    "num_steps": 1, "seed": 4,
                                    "eos_enabled": False})
    assert status == 200, body


def test_step_error_propagates_to_stream_consumer(httpd):
    """A failing step must raise out of stream_chunks (not hang the
    consumer) and unsubscribe the stream."""
    service = httpd.tts_service
    b = service.batcher
    boom = RuntimeError("injected stream failure")
    orig_step = b.step
    b.step = lambda: (_ for _ in ()).throw(boom)
    try:
        rid = service.submit_stream("hello", params=api.Params(
            num_frames=2, num_steps=1, seed=3, eos_enabled=False))
        with pytest.raises(RuntimeError, match="injected stream failure"):
            for _ in service.stream_chunks(rid, timeout=60):
                pass
    finally:
        b.step = orig_step
    assert rid not in service._streams


def _mk_server(tmp_path, **kw):
    path, fw, mw = write_model_dir(tmp_path / "m", seed=6)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    defaults = dict(host="127.0.0.1", port=0, slots=2, max_len=96,
                    prefix_budget=32, max_num_steps=4)
    defaults.update(kw)
    httpd = srv.serve(ctx, **defaults)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def test_queue_full_maps_to_429(tmp_path):
    """With the admission queue at max_queue, /tts returns 429 + Retry-After
    instead of queuing unboundedly (round-4 VERDICT: backpressure)."""
    httpd = _mk_server(tmp_path, slots=1, max_queue=1)
    service = httpd.tts_service
    b = service.batcher
    gate = threading.Event()
    orig_step = b.step

    def gated_step():
        gate.wait(60)
        return orig_step()

    b.step = gated_step
    try:
        p = {"text": "hello", "num_frames": 2, "num_steps": 1, "seed": 1,
             "eos_enabled": False}
        # first request occupies the whole queue (the gated loop can't pop)
        t1 = threading.Thread(target=_post, args=(httpd, p), daemon=True)
        t1.start()
        deadline = __import__("time").monotonic() + 30
        while not b.queue and __import__("time").monotonic() < deadline:
            __import__("time").sleep(0.01)
        assert b.queue, "first request never reached the queue"
        conn = http.client.HTTPConnection(*httpd.server_address, timeout=60)
        conn.request("POST", "/tts", json.dumps(p),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 429, body
        assert resp.getheader("Retry-After")
        conn.close()
    finally:
        gate.set()
        b.step = orig_step
        httpd.shutdown()
        httpd.tts_service.close()


def test_wait_timeout_retires_request(tmp_path):
    """A timed-out wait() cancels the request itself -- queued entries are
    dequeued / slots freed -- not just the waiter (deadline enforcement)."""
    httpd = _mk_server(tmp_path, slots=1)
    service = httpd.tts_service
    b = service.batcher
    gate = threading.Event()
    orig_step = b.step
    b.step = lambda: (gate.wait(60), orig_step())[1]
    try:
        rid = service.submit("hello", params=api.Params(
            num_frames=2, num_steps=1, seed=3, eos_enabled=False))
        with pytest.raises(TimeoutError):
            service.wait(rid, timeout=0.2)
        assert not b.queue and rid not in b.chunks
        gate.set()
        # service still serves afterwards, and the retired rid never lands
        # in _results
        audio = service.generate("world", params=api.Params(
            num_frames=2, num_steps=1, seed=4, eos_enabled=False),
            timeout=120)
        assert audio.num_samples > 0
        assert rid not in service._results
    finally:
        gate.set()
        b.step = orig_step
        httpd.shutdown()
        httpd.tts_service.close()


@pytest.mark.slow
def test_stream_disconnect_frees_slot(tmp_path):
    """A /tts-stream client that disconnects mid-stream must have its
    request cancelled -- slot freed, chunks dropped, subscription gone --
    within a step, not generate to max_frames (round-4 ADVICE medium)."""
    import socket
    import time as _t

    httpd = _mk_server(tmp_path, slots=1, frames_per_step=1)
    service = httpd.tts_service
    b = service.batcher
    try:
        p = {"text": "hello world", "num_frames": 40, "num_steps": 1,
             "seed": 5, "eos_enabled": False}
        body = json.dumps(p).encode()
        req = (b"POST /tts-stream HTTP/1.1\r\nHost: t\r\n"
               b"Content-Type: application/json\r\n"
               b"Content-Length: %d\r\n\r\n" % len(body)) + body
        s = socket.create_connection(httpd.server_address, timeout=60)
        s.sendall(req)
        # read headers + a bit of PCM so the stream is demonstrably live
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(4096)
        while len(buf) < len(buf[:buf.index(b"\r\n\r\n")]) + 64:
            buf += s.recv(4096)
        assert any(r is not None for r in b.slot_req)
        # hard disconnect (RST so the server's next write fails fast)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     struct.pack("ii", 1, 0))
        s.close()
        deadline = _t.monotonic() + 60
        while _t.monotonic() < deadline:
            if (all(r is None for r in b.slot_req) and not service._streams
                    and not b.chunks):
                break
            _t.sleep(0.05)
        assert all(r is None for r in b.slot_req), "slot not freed"
        assert not service._streams and not b.chunks
        # the slot is reusable: a follow-up request completes
        status, _, body2 = _post(httpd, {"text": "again", "num_frames": 2,
                                         "num_steps": 1, "seed": 6,
                                         "eos_enabled": False})
        assert status == 200, body2
    finally:
        httpd.shutdown()
        httpd.tts_service.close()


@pytest.mark.slow
def test_http10_stream_unframed(tmp_path):
    """An HTTP/1.0 client gets raw (unframed) s16le delimited by connection
    close -- chunked framing would read as PCM garbage (round-4 ADVICE)."""
    import socket

    httpd = _mk_server(tmp_path, slots=2)
    try:
        p = {"text": "hello world", "num_frames": 3, "num_steps": 1,
             "seed": 5, "temp": 0.5, "eos_enabled": False}
        body = json.dumps(p).encode()
        req = (b"POST /tts-stream HTTP/1.0\r\nHost: t\r\n"
               b"Content-Type: application/json\r\n"
               b"Content-Length: %d\r\n\r\n" % len(body)) + body
        with socket.create_connection(httpd.server_address, timeout=120) as s:
            s.sendall(req)
            f = s.makefile("rb")
            status = f.readline()
            assert b"200" in status
            headers = {}
            while True:
                line = f.readline().strip()
                if not line:
                    break
                k, _, v = line.partition(b":")
                headers[k.strip().lower()] = v.strip()
            assert b"transfer-encoding" not in headers
            data = f.read()  # delimited by connection close
        fs = TINY_MIMI.frame_samples
        got = np.frombuffer(data, "<i2")
        assert got.size == 3 * fs
    finally:
        httpd.shutdown()
        httpd.tts_service.close()
