"""DCN tier: inter-pod exchange over the native TCP transport.

Role of the reference deployment's mesh-network layer — the remote topic
manager that carries BoW vectors / VLC frames / pose graphs / dpgo pose
traffic BETWEEN machines (reference README.md:129,139,153-154; dpgo_ros
UPDATE traffic, images/kimera-multi.drawio:2325-2355). Intra-pod exchange
rides ICI collectives (dist/rounds.py); this module is the boundary that
crosses processes/hosts.

Transport: native/kmt_native.cpp `Peer` — TCP (reliable, ordered),
bounded receive queues (backpressure = flow control), chunked sends, and
per-peer byte counters (mTotalBytesReceived equivalent). Wire format is
the same framed-packet layout used for on-disk keyframe logs:

  type 1 EDGE    (C++ codec)  pose-graph edges
  type 2 VLC     (C++ codec)  keyframe descriptor/bearing/landmark frames
  type 3 CTRL    (Python)     little-endian i32[4]: kind, round, sender, value
  type 4 TENSOR  (Python)     i32 tag, i32 sender, u8 dtype, u8 ndim,
                              i32 dims[ndim], raw bytes

The exchange discipline is bulk-synchronous: a pod broadcasts a batch of
packets, terminates it with an END_OF_BATCH control carrying its rank, and
`collect` blocks until every other pod's terminator arrives — the
deterministic analogue of the reference's per-round request/response
state machine.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np

from ..io import native

TYPE_EDGE = 1
TYPE_VLC = 2
TYPE_CTRL = 3
TYPE_TENSOR = 4
TYPE_BOW = 5   # (Python) streamed BoW vector: robot, frame, ids, weights
TYPE_REQ = 6   # (Python) gap-fill request: kind + (robot, frame) list

CTRL_END_OF_BATCH = 1
CTRL_HASH = 2
CTRL_HELLO = 3  # handshake: maps a TCP connection to a pod rank

REQ_BOW = 1  # request_bow_vectors equivalent (drawio:271-391)
REQ_VLC = 2  # vlc_frame_request equivalent

_EDGE_REC_BYTES = 76  # sizeof(EdgeRec) in kmt_native.cpp (all 4-byte fields)

_HDR = struct.Struct("<IBI")  # magic, type, payload_len
_MAGIC = 0x314B4D54

_DTYPES = {0: np.float32, 1: np.int32, 2: np.uint8, 3: np.float64}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


class Ctrl(NamedTuple):
    kind: int
    round: int
    sender: int
    value: int


class Tensor(NamedTuple):
    tag: int
    sender: int
    array: np.ndarray


def _payload(buf: native.Buffer) -> bytes:
    raw = buf.tobytes()
    magic, ptype, n = _HDR.unpack_from(raw, 0)
    assert magic == _MAGIC, hex(magic)
    return raw[_HDR.size:_HDR.size + n]


def pack_ctrl(kind: int, rnd: int, sender: int, value: int = 0) -> bytes:
    return struct.pack("<4i", kind, rnd, sender, value)


def unpack_ctrl(payload: bytes) -> Ctrl:
    return Ctrl(*struct.unpack("<4i", payload))


def pack_tensor(tag: int, sender: int, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    code = _DTYPE_CODES[arr.dtype]
    head = struct.pack("<iiBB", tag, sender, code, arr.ndim)
    dims = struct.pack(f"<{arr.ndim}i", *arr.shape)
    return head + dims + arr.tobytes()


def unpack_tensor(payload: bytes) -> Tensor:
    tag, sender, code, ndim = struct.unpack_from("<iiBB", payload, 0)
    off = 10
    dims = struct.unpack_from(f"<{ndim}i", payload, off)
    off += 4 * ndim
    arr = np.frombuffer(payload, _DTYPES[code], offset=off).reshape(dims)
    return Tensor(tag, sender, arr.copy())


class BowMsg(NamedTuple):
    robot: int
    frame: int
    ids: np.ndarray      # (W,) int32 word ids (-1 padding)
    weights: np.ndarray  # (W,) f32


class ReqMsg(NamedTuple):
    kind: int            # REQ_BOW | REQ_VLC
    sender: int
    pairs: np.ndarray    # (N, 2) int32 (robot, frame)


def pack_bow(robot: int, frame: int, ids: np.ndarray,
             weights: np.ndarray) -> bytes:
    ids = np.ascontiguousarray(ids, np.int32)
    weights = np.ascontiguousarray(weights, np.float32)
    return (struct.pack("<3i", robot, frame, ids.shape[0])
            + ids.tobytes() + weights.tobytes())


def unpack_bow(payload: bytes) -> BowMsg:
    robot, frame, W = struct.unpack_from("<3i", payload, 0)
    off = 12
    ids = np.frombuffer(payload, np.int32, count=W, offset=off).copy()
    off += 4 * W
    weights = np.frombuffer(payload, np.float32, count=W,
                            offset=off).copy()
    return BowMsg(robot, frame, ids, weights)


def pack_req(kind: int, sender: int, pairs: np.ndarray) -> bytes:
    pairs = np.ascontiguousarray(pairs, np.int32).reshape(-1, 2)
    return (struct.pack("<3i", kind, sender, pairs.shape[0])
            + pairs.tobytes())


def unpack_req(payload: bytes) -> ReqMsg:
    kind, sender, n = struct.unpack_from("<3i", payload, 0)
    pairs = np.frombuffer(payload, np.int32, count=2 * n,
                          offset=12).reshape(n, 2).copy()
    return ReqMsg(kind, sender, pairs)


class DcnFabric:
    """Full mesh of pods on loopback TCP (host configurable for real DCN).

    Rank r binds port_base + r and dials every lower rank; each pair of
    pods therefore shares exactly one connection. Packet routing carries
    sender identity in the payloads, so broadcasts need no per-connection
    bookkeeping.
    """

    def __init__(self, rank: int, n_pods: int, port_base: int,
                 host: str = "127.0.0.1", queue_capacity: int = 1024,
                 setup_timeout_s: float = 30.0):
        import time
        from collections import deque

        self.rank = rank
        self.n_pods = n_pods
        self.peer = native.Peer(port=port_base + rank,
                                queue_capacity=queue_capacity,
                                loopback_only=(host in ("127.0.0.1",
                                                        "localhost")))
        # (sender_rank, ptype, buf) drained but not yet consumed, in
        # arrival order
        self._pending: deque = deque()
        # per-sender packets received AFTER that sender's END_OF_BATCH for
        # the round currently being collected — they belong to the
        # sender's NEXT round (TCP FIFO per connection makes this exact)
        self._stash: dict[int, deque] = {}
        self._rank_of_conn: dict[int, int] = {}
        for j in range(rank):
            self.peer.connect(host, port_base + j,
                              retries=int(setup_timeout_s / 0.1))
        t0 = time.time()
        while self.peer.n_conns() < n_pods - 1:
            if time.time() - t0 > setup_timeout_s:
                raise TimeoutError(
                    f"pod {rank}: only {self.peer.n_conns()} of "
                    f"{n_pods - 1} peers connected")
            time.sleep(0.02)
        # Handshake: every pod broadcasts a HELLO carrying its rank. The
        # HELLO is the FIRST packet on each connection (FIFO), so mapping
        # conn -> rank here attributes every later packet to its sender —
        # the fix for the >= 3-pod round-interleaving race (a fast peer's
        # next-round traffic used to be misfiled into the current round).
        buf = native.Buffer()
        buf.write_raw(TYPE_CTRL, pack_ctrl(CTRL_HELLO, 0, self.rank, 0))
        self.peer.send(buf)
        while len(self._rank_of_conn) < n_pods - 1:
            got = self.peer.recv_from(
                timeout_ms=int(setup_timeout_s * 1000))
            if got is None:
                raise TimeoutError(
                    f"pod {rank}: handshake timeout "
                    f"({len(self._rank_of_conn)}/{n_pods - 1} HELLOs)")
            ptype, b, conn = got
            if ptype == TYPE_CTRL:
                c = unpack_ctrl(_payload(b))
                if c.kind == CTRL_HELLO:
                    self._rank_of_conn[conn] = c.sender
                    self._stash.setdefault(c.sender, deque())
                    continue
            # a non-HELLO packet can only come from an already-mapped
            # connection (the HELLO is first in that connection's FIFO)
            if conn not in self._rank_of_conn:
                raise RuntimeError(
                    f"pod {rank}: data packet type {ptype} before HELLO "
                    f"on connection {conn}")
            self._pending.append((self._rank_of_conn[conn], ptype, b))

    def _pump(self) -> None:
        """Drain everything already received into the pending store.

        Called on every send: a bulk-synchronous phase has every pod
        sending its whole batch before collecting, so without draining,
        two pods whose batches exceed the bounded receive queue + TCP
        buffers would both block in send() forever (the receiver's
        recv_loop stops reading once its queue fills — that backpressure
        is flow control between phases, but deadlock within one)."""
        while True:
            got = self.peer.recv_from(timeout_ms=0)
            if got is None:
                return
            ptype, buf, conn = got
            self._pending.append((self._rank_of_conn[conn], ptype, buf))

    def _next_packet(self, timeout_ms: int):
        """(sender_rank, ptype, buf) or None on timeout."""
        if self._pending:
            return self._pending.popleft()
        got = self.peer.recv_from(timeout_ms=timeout_ms)
        if got is None:
            return None
        ptype, buf, conn = got
        return self._rank_of_conn[conn], ptype, buf

    # ---- send side -----------------------------------------------------
    def send_edges(self, edges) -> int:
        self._pump()
        buf = native.Buffer()
        buf.write_edges(edges)
        return self.peer.send(buf)

    def send_vlc(self, robot: int, frame: int, desc, bearings, landmarks,
                 valid, has_depth=None) -> int:
        self._pump()
        buf = native.Buffer()
        buf.write_vlc(robot, frame, desc, bearings, landmarks, valid,
                      has_depth)
        return self.peer.send(buf)

    def send_tensor(self, tag: int, arr: np.ndarray) -> int:
        self._pump()
        buf = native.Buffer()
        buf.write_raw(TYPE_TENSOR, pack_tensor(tag, self.rank, arr))
        return self.peer.send(buf)

    def send_ctrl(self, kind: int, rnd: int, value: int = 0) -> int:
        self._pump()
        buf = native.Buffer()
        buf.write_raw(TYPE_CTRL, pack_ctrl(kind, rnd, self.rank, value))
        return self.peer.send(buf)

    def send_bow(self, robot: int, frame: int, ids, weights) -> int:
        """Stream one keyframe's BoW vector (the incremental BoW-publish
        tier: bow_batch_size/bow_skip_num semantics live in the caller;
        reference launch/kimera_vio_jackal.launch:13-14)."""
        self._pump()
        buf = native.Buffer()
        buf.write_raw(TYPE_BOW, pack_bow(robot, frame, ids, weights))
        return self.peer.send(buf)

    def send_req(self, kind: int, pairs) -> int:
        """Gap-fill request for missing BoW vectors (REQ_BOW) or VLC
        frames needed for verification (REQ_VLC) — request_bow_vectors /
        vlc_frame_request equivalents (drawio:271-391)."""
        self._pump()
        buf = native.Buffer()
        buf.write_raw(TYPE_REQ, pack_req(kind, self.rank,
                                         np.asarray(pairs, np.int32)))
        return self.peer.send(buf)

    def end_batch(self, rnd: int, count: int = 0) -> None:
        self.send_ctrl(CTRL_END_OF_BATCH, rnd, count)

    # ---- receive side ----------------------------------------------------
    def collect(self, rnd: int, max_edges: int = 4096,
                max_feats: int = 1024, timeout_s: float = 120.0):
        """Receive until END_OF_BATCH(rnd) arrived from every other pod.

        Returns dict with keys 'edges' (list of (sender_rank,
        PoseGraphEdges) — one batched decode per sender), 'vlc' (list of
        frame dicts), 'tensors' (list of Tensor), 'ctrl' (list of
        non-terminator Ctrl).

        Round safety with >= 3 pods: a fast peer that has already seen
        every round-`rnd` terminator legitimately advances and sends
        round-`rnd`+1 traffic while this pod is still collecting round
        `rnd`. Every packet is attributed to its sender (connection
        handshake + per-connection TCP FIFO); once a sender's
        END_OF_BATCH(rnd) is consumed, any further packet from that
        sender is stashed for the next collect instead of being misfiled
        into this round. Terminators for earlier rounds are tolerated
        (uncollected fire-and-forget batches); a terminator from a LATER
        round without the current one first would violate FIFO and raises.
        """
        out = {"edges": [], "vlc": [], "tensors": [], "ctrl": [],
               "bow": [], "req": [], "eob_value": {}}
        seen_eob: set[int] = set()
        want = self.n_pods - 1
        # raw framed edge-packet bytes per sender, decoded once at the end
        edge_raw: dict[int, list] = {}

        def _consume(sender: int, ptype: int, buf) -> bool:
            """Returns True when the packet was this round's terminator."""
            if ptype == TYPE_EDGE:
                edge_raw.setdefault(sender, []).append(buf.tobytes())
            elif ptype == TYPE_VLC:
                out["vlc"].append(buf.read_vlc(max_feats))
            elif ptype == TYPE_TENSOR:
                out["tensors"].append(unpack_tensor(_payload(buf)))
            elif ptype == TYPE_BOW:
                out["bow"].append(unpack_bow(_payload(buf)))
            elif ptype == TYPE_REQ:
                out["req"].append(unpack_req(_payload(buf)))
            elif ptype == TYPE_CTRL:
                c = unpack_ctrl(_payload(buf))
                if c.kind == CTRL_END_OF_BATCH:
                    if c.round == rnd:
                        # the terminator's value field carries the
                        # sender's remaining-work count (streaming
                        # protocols use it to agree on round counts)
                        out["eob_value"][sender] = c.value
                        return True
                    if c.round > rnd:
                        raise RuntimeError(
                            f"pod {self.rank}: terminator for round "
                            f"{c.round} from pod {sender} before its "
                            f"round-{rnd} terminator (FIFO violation)")
                    # c.round < rnd: stale terminator of a round the
                    # caller never collected — ignore
                else:
                    out["ctrl"].append(c)
            return False

        # first replay per-sender stashes (packets that arrived beyond a
        # sender's terminator during an earlier collect)
        for s, dq in self._stash.items():
            while dq and s not in seen_eob:
                ptype, buf = dq.popleft()
                if _consume(s, ptype, buf):
                    seen_eob.add(s)

        while len(seen_eob) < want:
            got = self._next_packet(timeout_ms=int(timeout_s * 1000))
            if got is None:
                raise TimeoutError(
                    f"pod {self.rank} round {rnd}: {len(seen_eob)}/{want} "
                    f"terminators after {timeout_s}s")
            sender, ptype, buf = got
            if sender in seen_eob:
                self._stash[sender].append((ptype, buf))
                continue
            if _consume(sender, ptype, buf):
                seen_eob.add(sender)

        for s in sorted(edge_raw):
            raw = b"".join(edge_raw[s])
            buf = native.Buffer()
            buf.load(raw)
            # capacity from the actual byte count (each framed edge packet
            # is 9 header + 76 record bytes), capped by max_edges — not
            # one max_edges-sized allocation per single-edge packet
            cap = min(max_edges, len(raw) // _EDGE_REC_BYTES + 1)
            out["edges"].append((s, buf.read_edges(cap)))
        return out

    # ---- composite ops ---------------------------------------------------
    def allgather_tensor(self, tag: int, rnd: int, local: np.ndarray,
                         pod_of_part, n_parts: int,
                         timeout_s: float = 120.0) -> np.ndarray:
        """Bulk-synchronous all-gather of a partitioned tensor over DCN.

        `local` holds this pod's parts stacked on axis 0; `pod_of_part(i)`
        maps global part index -> owning pod rank. Returns the full
        (n_parts, ...) array. The DCN analogue of the intra-pod
        `lax.all_gather` separator exchange (dist/rounds.py)."""
        self.send_tensor(tag, local)
        self.end_batch(rnd)
        got = self.collect(rnd, timeout_s=timeout_s)
        parts_by_pod = {t.sender: t.array for t in got["tensors"]
                        if t.tag == tag}
        parts_by_pod[self.rank] = local
        full = np.zeros((n_parts,) + local.shape[1:], local.dtype)
        cursor = {r: 0 for r in range(self.n_pods)}
        for i in range(n_parts):
            r = pod_of_part(i)
            full[i] = parts_by_pod[r][cursor[r]]
            cursor[r] += 1
        return full

    def bytes_counters(self) -> tuple[int, int]:
        return self.peer.bytes_sent(), self.peer.bytes_received()

    def close(self):
        self.peer.close()


def stream_bow_exchange(
    fabric: DcnFabric,
    own: list[int],
    kf_valid: np.ndarray,   # (R, T) bool — valid only for OWN robots
    ids: np.ndarray,        # (R, T, W) int32 — filled only for OWN robots
    weights: np.ndarray,    # (R, T, W) f32
    rnd0: int,
    chunk: int = 8,
    batch_size: int = 16,
    skip: int = 0,
    withhold=None,
    log=None,
):
    """Incremental BoW streaming with gap-filling — the deployment traffic
    pattern of the reference's BoW publishing tier
    (images/kimera-multi.drawio:271-391; bow_batch_size / bow_skip_num,
    launch/kimera_vio_jackal.launch:13-14), replacing the round-3 one-shot
    broadcast (VERDICT r3 item 7).

    Per stream round, each pod enqueues the keyframes "produced" in that
    round's chunk of steps and publishes AT MOST `batch_size` BoW vectors
    (bow_batch_size throttling; the remainder carries over), skipping
    every frame with f % (skip+1) != 0 (bow_skip_num — those are served
    only on request). After the stream, every pod requests the (robot,
    frame) BoWs it is still missing from the fleet (REQ_BOW) and owners
    answer; frames still absent after gap-fill are non-keyframes.

    `withhold(robot) -> bool` simulates a late-joining robot: its frames
    are never published during the stream rounds and are recovered
    entirely by the gap-fill phase (the late-join test's subject).

    Returns (ids_full, weights_full, have (R, T) bool, round_bytes list
    of per-round sent-byte counts, next_round). Per-round sent bytes are
    bounded by batch_size * (20 + 8 W + frame overhead) by construction —
    the bandwidth budget the round-3 broadcast lacked.
    """
    R, T, W = ids.shape
    ids = ids.copy()
    weights = weights.copy()
    have = np.zeros((R, T), bool)
    for r in own:
        have[r] = kf_valid[r]

    round_bytes: list[int] = []
    rnd = rnd0
    n_chunks = -(-T // chunk)
    sent_prev = fabric.bytes_counters()[0]

    # full publish schedule, known locally: chunk s "produces" the
    # publishable keyframes of steps [s*chunk, (s+1)*chunk)
    schedule: list[list[tuple[int, int]]] = []
    for s in range(n_chunks):
        lo, hi = s * chunk, min((s + 1) * chunk, T)
        produced = []
        for r in own:
            if withhold is not None and withhold(r):
                continue
            for f in range(lo, hi):
                if kf_valid[r, f] and f % (skip + 1) == 0:
                    produced.append((r, f))
        schedule.append(produced)

    def _absorb(got):
        for b in got["bow"]:
            ids[b.robot, b.frame] = b.ids
            weights[b.robot, b.frame] = b.weights
            have[b.robot, b.frame] = True

    # ---- stream rounds: produce chunk, publish <= batch_size ----------
    # Round-count agreement: every terminator carries the sender's
    # remaining frame count; all pods therefore see the same per-round
    # remaining vector and apply the same stop rule — no pod can exit
    # the loop while any peer still has frames queued (a pod that
    # stopped collecting would deadlock the others' end_batch barrier).
    pending: list[tuple[int, int]] = []
    ci = 0
    while True:
        if ci < n_chunks:
            pending.extend(schedule[ci])
            ci += 1
        n_send = min(batch_size, len(pending))
        for r, f in pending[:n_send]:
            fabric.send_bow(r, f, ids[r, f], weights[r, f])
        del pending[:n_send]
        my_left = len(pending) + sum(
            len(schedule[s]) for s in range(ci, n_chunks))
        fabric.end_batch(rnd, count=my_left)
        got = fabric.collect(rnd)
        _absorb(got)
        peers_left = sum(got["eob_value"].values())
        sent_now = fabric.bytes_counters()[0]
        round_bytes.append(sent_now - sent_prev)
        sent_prev = sent_now
        if log:
            log(f"bow stream round {rnd - rnd0}: sent {n_send} vectors "
                f"({round_bytes[-1]} B), left {my_left}+{peers_left}")
        rnd += 1
        if my_left == 0 and peers_left == 0 and ci >= n_chunks:
            break

    # ---- gap-fill: request everything still missing -------------------
    own_set = set(own)
    missing = [(r, f) for r in range(R) if r not in own_set
               for f in range(T) if not have[r, f]]
    if missing:
        fabric.send_req(REQ_BOW, np.asarray(missing, np.int32))
    fabric.end_batch(rnd, count=len(missing))
    got = fabric.collect(rnd)
    rnd += 1
    # answer peers' requests for frames we own
    n_served = 0
    for req in got["req"]:
        if req.kind != REQ_BOW:
            continue
        for r, f in req.pairs:
            if int(r) in own_set and kf_valid[int(r), int(f)]:
                fabric.send_bow(int(r), int(f), ids[int(r), int(f)],
                                weights[int(r), int(f)])
                n_served += 1
    fabric.end_batch(rnd, count=n_served)
    _absorb(fabric.collect(rnd))
    rnd += 1
    sent_now = fabric.bytes_counters()[0]
    round_bytes.append(sent_now - sent_prev)
    if log:
        log(f"bow gap-fill: requested {len(missing)}, served {n_served} "
            f"({round_bytes[-1]} B)")
    return ids, weights, have, round_bytes, rnd


def vlc_request_exchange(
    fabric: DcnFabric,
    own: list[int],
    needed_pairs: np.ndarray,  # (N, 2) int32 (robot, frame) NOT owned
    desc: np.ndarray, bear: np.ndarray, lm: np.ndarray,
    ovalid: np.ndarray,
    rnd0: int,
    log=None,
):
    """On-demand VLC frame fetch for verification — vlc_frame_request
    semantics (drawio:271-391): only frames that a geometric-verification
    candidate actually references cross the wire, instead of the whole
    fleet's keyframe stores. Fills desc/bear/lm/ovalid in place for the
    received frames; answers peers' requests from the owned stores.
    Returns next_round."""
    own_set = set(own)
    rnd = rnd0
    if len(needed_pairs):
        fabric.send_req(REQ_VLC, np.asarray(needed_pairs, np.int32))
    fabric.end_batch(rnd, count=len(needed_pairs))
    got = fabric.collect(rnd)
    rnd += 1
    n_served = 0
    for req in got["req"]:
        if req.kind != REQ_VLC:
            continue
        for r, f in req.pairs:
            r, f = int(r), int(f)
            if r in own_set:
                fabric.send_vlc(r, f, desc[r, f], bear[r, f], lm[r, f],
                                ovalid[r, f])
                n_served += 1
    fabric.end_batch(rnd, count=n_served)
    got = fabric.collect(rnd, max_feats=desc.shape[2])
    rnd += 1
    n_got = 0
    for fr in got["vlc"]:
        r, f, n = fr["robot"], fr["frame"], fr["n"]
        desc[r, f, :n] = fr["descriptors"]
        bear[r, f, :n] = fr["bearings"]
        lm[r, f, :n] = fr["landmarks"]
        ovalid[r, f, :n] = fr["valid"]
        n_got += 1
    if log:
        log(f"vlc on-demand: requested {len(needed_pairs)}, served "
            f"{n_served}, received {n_got}")
    return rnd
