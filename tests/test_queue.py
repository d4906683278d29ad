"""Fake-clock queue tests (reference model: smelter-core/src/queue/tests/)."""

import numpy as np
import pytest

from smelter_tpu.core.types import AudioSamples, Frame, Framerate, PixelFormat, Resolution
from smelter_tpu.queue.sync_queue import (
    Queue,
    QueueInputOptions,
    QueueOptions,
)
from smelter_tpu.utils.channels import Channel


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def now(self):
        return self.t

    def sleep(self, s):
        self.t += s

    def advance(self, s):
        self.t += s


def _frame(pts, w=4, h=4):
    return Frame(np.zeros((h, w, 4), np.uint8), PixelFormat.RGBA, Resolution(w, h), pts)


def _samples(pts, n=960):
    return AudioSamples(np.zeros((n, 2), np.float32), pts)


def make_queue(fps=25, **opts):
    clock = FakeClock()
    events = []
    q = Queue(
        QueueOptions(output_framerate=Framerate(fps), **opts),
        clock=clock,
        event_callback=lambda iid, kind: events.append((iid, kind)),
    )
    video_out = Channel(100)
    audio_out = Channel(100)
    return q, clock, video_out, audio_out, events


def test_single_input_realtime_frames():
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    vch, _ = qi.current.video.channel, None
    vch = qi.current.video.channel
    q.start(vout, aout)
    # producer pushes frames at 25 fps starting at queue time 0
    for i in range(5):
        vch.try_send(_frame(pts=i * 0.04))
    # advance wall clock so ticks are due and run tick
    clock.advance(0.1)
    q.on_tick()
    got = []
    while len(vout):
        got.append(vout.recv())
    assert len(got) >= 2
    assert got[0].pts == pytest.approx(0.0)
    assert got[1].pts == pytest.approx(0.04)
    # frame with matching pts attached (offset auto-resolved to ~0)
    assert got[1].frames["a"].frame is not None


def test_required_input_blocks_until_ready():
    # A required input that STARTED delivering blocks the queue while its
    # buffer can't serve the next pts (a brand-new stream does not block -
    # reference video_input.rs is_ready_for_pts ReceiverState::New => true).
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(required=True), has_audio=False)
    q.start(vout, aout)
    vch = qi.current.video.channel
    vch.try_send(_frame(pts=0.0))  # stream becomes Running
    clock.advance(0.5)
    q.on_tick()
    n_before = len(vout)
    q.on_tick()
    assert len(vout) == n_before  # stalled: no more frames buffered
    for i in range(1, 13):
        vch.try_send(_frame(pts=i * 0.04))
        q.on_tick()
    assert len(vout) > n_before  # unblocked once frames arrive


def test_optional_input_does_not_block_after_deadline():
    q, clock, vout, aout, _ = make_queue(fps=25)
    q.add_input("a", QueueInputOptions(required=False), has_audio=False)
    q.start(vout, aout)
    clock.advance(0.2)  # past several frame deadlines
    q.on_tick()
    got = []
    while len(vout):
        got.append(vout.recv())
    assert len(got) >= 1  # pushed framesets with empty frames
    assert got[0].frames["a"].frame is None


def test_offset_from_start_delays_input():
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input(
        "a", QueueInputOptions(offset=("from_start", 0.2)), has_audio=False
    )
    q.start(vout, aout)
    vch = qi.current.video.channel
    vch.try_send(_frame(pts=0.0))
    vch.try_send(_frame(pts=0.04))
    clock.advance(0.3)
    q.on_tick()
    got = []
    while len(vout):
        got.append(vout.recv())
    # frames before 0.2 have no content for input a
    for b in got:
        if b.pts < 0.2 - 1e-9:
            assert b.frames["a"].frame is None
        if abs(b.pts - 0.2) < 0.02:
            assert b.frames["a"].frame is not None


def test_audio_chunks_20ms():
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_video=False)
    ach = qi.current.audio.channel
    q.start(vout, aout)
    for i in range(10):
        ach.try_send(_samples(pts=i * 0.02))
    clock.advance(0.1)
    q.on_tick()
    got = []
    while len(aout):
        got.append(aout.recv())
    assert len(got) >= 4
    assert got[0].start_pts == pytest.approx(0.0)
    assert got[0].end_pts == pytest.approx(0.02)
    assert len(got[1].samples["a"]) >= 1


def test_video_audio_interleaved_order():
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions())
    vch = qi.current.video.channel
    ach = qi.current.audio.channel
    q.start(vout, aout)
    for i in range(5):
        vch.try_send(_frame(pts=i * 0.04))
    for i in range(12):
        ach.try_send(_samples(pts=i * 0.02))
    clock.advance(0.09)
    q.on_tick()
    # audio ticks at 0.0,0.02,0.04,0.06,0.08; video at 0.0,0.04,0.08
    assert len(aout) >= 4
    assert len(vout) >= 2


def test_eos_reported_once():
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    vch = qi.current.video.channel
    q.start(vout, aout)
    vch.try_send(_frame(pts=0.0))
    vch.close()
    clock.advance(0.2)
    q.on_tick()
    eos_flags = []
    while len(vout):
        eos_flags.append(vout.recv().frames["a"].is_eos)
    assert eos_flags.count(True) == 1


def test_scheduled_event_fires_between_buffers():
    q, clock, vout, aout, _ = make_queue(fps=25)
    q.add_input("a", QueueInputOptions(), has_audio=False)
    fired = []
    q.start(vout, aout)
    q.schedule_event(0.05, lambda: fired.append(q.last_pts))
    clock.advance(0.1)
    q.on_tick()
    assert len(fired) == 1
    assert fired[0] == pytest.approx(0.05 + q.start_pts)


def test_late_scheduled_event_discarded_by_default():
    q, clock, vout, aout, _ = make_queue(fps=25)
    q.add_input("a", QueueInputOptions(), has_audio=False)
    q.start(vout, aout)
    clock.advance(0.5)
    q.on_tick()  # advance counters past 0.1
    fired = []
    q.schedule_event(0.01, lambda: fired.append(1))
    q.on_tick()
    assert fired == []


def test_run_late_scheduled_events_option():
    q, clock, vout, aout, _ = make_queue(fps=25, run_late_scheduled_events=True)
    q.add_input("a", QueueInputOptions(), has_audio=False)
    q.start(vout, aout)
    clock.advance(0.5)
    q.on_tick()
    fired = []
    q.schedule_event(0.01, lambda: fired.append(1))
    clock.advance(0.01)
    q.on_tick()
    assert fired == [1]


def test_events_delivered_playing_eos():
    q, clock, vout, aout, events = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    vch = qi.current.video.channel
    q.start(vout, aout)
    vch.try_send(_frame(pts=0.0))
    vch.close()
    clock.advance(0.2)
    q.on_tick()
    kinds = [k for _, k in events]
    assert "delivered" in kinds
    assert "playing" in kinds
    assert "eos" in kinds


def test_track_swap_after_eos():
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    first = qi.current.video.channel
    vch2, _ = qi.add_track(("from_start", 0.0), has_audio=False)
    q.start(vout, aout)
    first.try_send(_frame(pts=0.0))
    first.close()
    clock.advance(0.1)
    q.on_tick()  # drains track 1 + EOS
    while len(vout):
        vout.recv()
    # push to second track; after swap frames flow again
    vch2.try_send(_frame(pts=0.0))
    vch2.try_send(_frame(pts=0.04))
    clock.advance(0.1)
    q.on_tick()
    got = []
    while len(vout):
        got.append(vout.recv())
    assert any(b.frames["a"].frame is not None for b in got)


def test_pause_repeats_frame():
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    vch = qi.current.video.channel
    q.start(vout, aout)
    for i in range(3):
        vch.try_send(_frame(pts=i * 0.04))
    clock.advance(0.05)
    q.on_tick()
    while len(vout):
        vout.recv()
    qi.pause()
    clock.advance(0.08)
    q.on_tick()
    got = []
    while len(vout):
        got.append(vout.recv())
    assert got, "paused input still produces framesets"
    assert all(b.frames["a"].frame is not None for b in got)


def test_offset_from_start_exact_frame_selection_trace():
    """Exact mirror of queue/tests/video.rs offset_from_start_delivered_early:
    50 fps output, input at 15 ms cadence with a 60 ms from-start offset.
    The reference trace: empty batches at 0/20/40 ms, then frames with
    (offset) pts 60, 75, 90, then 105 is SKIPPED (120 is closer to the
    120 ms tick), and nothing after the last frame until a successor or
    EOS arrives."""
    q, clock, vout, aout, _ = make_queue(fps=50)
    qi = q.add_input(
        "a", QueueInputOptions(offset=("from_start", 0.060)), has_audio=False
    )
    q.start(vout, aout)
    vch = qi.current.video.channel
    for i in range(6):
        vch.try_send(_frame(pts=i * 0.015))
        qi.current.video._try_enqueue()  # capacity-1 channel: pump inline

    clock.advance(0.130)
    q.on_tick()
    got = []
    while len(vout):
        got.append(vout.recv())

    by_pts = {round(b.pts, 3): b.frames["a"].frame for b in got}
    # before the offset: batches exist but carry no frame for this input
    for pts in (0.0, 0.02, 0.04):
        assert by_pts.get(pts) is None, (pts, by_pts.get(pts))
    # offset frames land: output 60->60, 80->75, 100->90, 120->120 (105 skipped)
    assert by_pts[0.06] is not None
    assert by_pts[0.06].pts == pytest.approx(0.06)
    assert by_pts[0.08].pts == pytest.approx(0.075)
    assert by_pts[0.1].pts == pytest.approx(0.09)
    assert by_pts[0.12].pts == pytest.approx(0.12)
    # the final frame (135) has no successor: the 140 ms batch must not
    # have been emitted yet (the queue can't prove 135 is current)
    assert 0.14 not in by_pts


def test_audio_events_carry_audio_kinds():
    """Audio delivered/playing/eos emit the audio-prefixed queue kinds (the
    wire maps them to AUDIO_INPUT_*; they used to masquerade as video)."""
    q, clock, vout, aout, events = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_video=False, has_audio=True)
    ach = qi.current.audio.channel
    q.start(vout, aout)
    ach.try_send(_samples(pts=0.0))
    ach.close()
    clock.advance(0.3)
    q.on_tick()
    kinds = [k for _, k in events]
    assert "audio:delivered" in kinds
    assert "audio:playing" in kinds
    assert "audio:eos" in kinds
    # no video events for an input without frames served
    assert "playing" not in kinds


def test_pause_emits_paused_and_resume_rearms_playing():
    q, clock, vout, aout, events = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    vch = qi.current.video.channel
    q.start(vout, aout)
    for i in range(6):
        vch.try_send(_frame(pts=i * 0.04))
    clock.advance(0.05)
    q.on_tick()
    assert ("a", "playing") in events
    qi.pause()
    assert ("a", "paused") in events
    events.clear()
    qi.resume()
    clock.advance(0.08)
    q.on_tick()
    # PLAYING re-emits on the first frame served after resume
    assert ("a", "playing") in events


def test_eos_emitted_once_per_track():
    q, clock, vout, aout, events = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    vch = qi.current.video.channel
    q.start(vout, aout)
    vch.try_send(_frame(pts=0.0))
    vch.close()
    clock.advance(0.3)
    q.on_tick()
    clock.advance(0.3)
    q.on_tick()
    assert [k for _, k in events].count("eos") == 1


def test_pause_longer_than_audio_buffer_recovers():
    """Pausing a required audio input for longer than its buffered depth
    must not wedge the queue: on resume the receiver buffers PAST max_size
    until the needed pts is covered (audio_input.rs try_enqueue_until), the
    backlog drains, and PLAYING re-emits."""
    q, clock, vout, aout, events = make_queue(fps=25)
    qi = q.add_input(
        "a", QueueInputOptions(required=True),
        has_video=False, has_audio=True,
    )
    ach = qi.current.audio.channel
    q.start(vout, aout)
    next_pts = [0.0]

    def feed():
        # a blocked reader thread: pushes whenever the channel has room
        while ach.try_send(_samples(pts=next_pts[0], n=960)):
            next_pts[0] += 0.02

    feed()
    clock.advance(0.1)
    q.on_tick()
    assert ("a", "audio:playing") in events
    qi.pause()
    # paused for 1 s — far past the ~0.18 s audio buffer depth
    for _ in range(10):
        clock.advance(0.1)
        q.on_tick()
        feed()
    qi.resume()
    events.clear()
    for _ in range(30):
        feed()
        clock.advance(0.05)
        q.on_tick()
    assert ("a", "audio:playing") in events, "queue wedged after resume"


def test_scheduled_callback_failure_does_not_kill_queue():
    """A raising scheduled callback (e.g. an update scheduled after its
    output was unregistered) must be logged and skipped, not propagate out
    of on_tick — and callbacks run OUTSIDE the queue lock so they can
    re-enter pipeline/queue methods without inverting lock order."""
    q, clock, vout, aout, _ = make_queue(fps=25)
    qi = q.add_input("a", QueueInputOptions(), has_audio=False)
    vch = qi.current.video.channel
    q.start(vout, aout)
    ran = []

    def boom():
        # prove the queue lock is NOT held here: acquiring it via a public
        # queue method from the callback must not deadlock even if the lock
        # were non-reentrant for this thread
        q.schedule_event(99.0, lambda: None)
        ran.append(True)
        raise RuntimeError("scheduled update after unregister")

    q.schedule_event(0.05, boom)
    for i in range(8):
        vch.try_send(_frame(pts=i * 0.04))
    clock.advance(0.3)
    q.on_tick()  # must not raise
    assert ran, "callback never fired"
    got = []
    while len(vout):
        got.append(vout.recv())
    # frames continued past the failing event's pts
    assert any(b.pts > 0.05 for b in got)
