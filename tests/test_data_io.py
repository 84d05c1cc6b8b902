"""TFRecord/SequenceExample codec and session round-trips; sessionization and
preprocessing utilities."""
import numpy as np
import pytest

from chameleon_recsys_tpu.data.collate import Session
from chameleon_recsys_tpu.data.example_proto import (
    decode_example,
    decode_sequence_example,
    encode_example,
    encode_sequence_example,
)
from chameleon_recsys_tpu.data.preprocessing.sessionization import (
    Click,
    sessionize_clicks,
)
from chameleon_recsys_tpu.data.preprocessing.tokenization import (
    build_vocabulary,
    convert_tokens_to_int,
    tokenize_articles,
)
from chameleon_recsys_tpu.data.preprocessing.word_embeddings import (
    build_embedding_matrix_for_vocab,
)
from chameleon_recsys_tpu.data.sessions import (
    read_sessions_tfrecord,
    write_sessions_tfrecord,
)
from chameleon_recsys_tpu.data.tfrecord import (
    crc32c,
    read_tfrecord_file,
    write_tfrecord_file,
)

from conftest import tiny_session_schema


def test_crc32c_known_vectors():
    # Castagnoli CRC of "123456789" is 0xE3069283
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_tfrecord_roundtrip(tmp_path):
    records = [b"hello", b"", b"x" * 10000]
    path = tmp_path / "test.tfrecord.gz"
    write_tfrecord_file(path, records)
    out = list(read_tfrecord_file(path, verify_crc=True))
    assert out == records


def test_sequence_example_roundtrip():
    context = {"session_id": [123456789012], "neg": [-5], "name": [b"abc"]}
    sequences = {
        "items": [[1], [2], [3]],
        "scores": [[0.5], [1.5], [-2.25]],
    }
    buf = encode_sequence_example(context, sequences)
    ctx, seqs = decode_sequence_example(buf)
    assert ctx["session_id"] == [123456789012]
    assert ctx["neg"] == [-5]
    assert ctx["name"] == [b"abc"]
    assert seqs["items"] == [[1], [2], [3]]
    np.testing.assert_allclose(
        [s[0] for s in seqs["scores"]], [0.5, 1.5, -2.25]
    )


def test_example_roundtrip():
    buf = encode_example({"a": [1, 2, 3], "b": [0.25], "c": [b"xyz"]})
    out = decode_example(buf)
    assert out["a"] == [1, 2, 3]
    assert out["c"] == [b"xyz"]


def test_sessions_tfrecord_roundtrip(tmp_path):
    schema = tiny_session_schema()
    sessions = [
        Session(
            session_id=1000 + i,
            user_id=i,
            session_start=5000 + i,
            item_ids=[1 + i, 2 + i, 3 + i],
            timestamps=[5000 + i, 5010 + i, 5020 + i],
            context={
                "device": [1, 2, 3],
                "os": [4, 5, 6],
                "hour_sin": [0.1, 0.2, 0.3],
            },
        )
        for i in range(3)
    ]
    path = tmp_path / "hour_000.tfrecord.gz"
    write_sessions_tfrecord(sessions, schema, path, epoch_ms=1_500_000_000_000)
    back = read_sessions_tfrecord(path, schema, epoch_ms=1_500_000_000_000)
    assert len(back) == 3
    for orig, got in zip(sessions, back):
        assert got.session_id == orig.session_id
        assert got.item_ids == orig.item_ids
        assert got.timestamps == orig.timestamps
        assert got.context["device"] == orig.context["device"]
        np.testing.assert_allclose(
            got.context["hour_sin"], orig.context["hour_sin"], rtol=1e-6
        )


def test_sessionization_idle_cutoff_and_dedup():
    ms = 1000
    clicks = [
        Click("alice", 10, 0 * ms),
        Click("alice", 11, 60 * ms),
        Click("alice", 11, 90 * ms),  # repeat within session → dropped
        Click("alice", 12, 40 * 60 * 1000),  # >30 min idle → new session
        Click("alice", 13, 40 * 60 * 1000 + 5000),
        Click("bob", 20, 10 * ms),  # single click → discarded
    ]
    sessions = list(sessionize_clicks(clicks, dataset_start_ms=0))
    assert len(sessions) == 2
    assert [c.article_id for c in sessions[0].clicks] == [10, 11]
    assert [c.article_id for c in sessions[1].clicks] == [12, 13]
    # session ids sort by start time
    assert sessions[0].session_id < sessions[1].session_id


def test_tokenization_and_vocab():
    texts = ["The quick brown fox. Jumps over the lazy dog.", "the fox again"]
    tokenized = tokenize_articles(texts)
    vocab = build_vocabulary(tokenized, max_vocab_size=8)
    assert vocab["<PAD>"] == 0 and vocab["<UNK>"] == 1
    assert "the" in vocab  # most frequent word survives the cap
    ids = convert_tokens_to_int(tokenized[0], vocab, max_length=6)
    assert len(ids) == 6
    short = convert_tokens_to_int(["the"], vocab, max_length=4)
    assert short[1:] == [0, 0, 0]


def test_word_embedding_matrix():
    pretrained = {"cat": np.ones(4), "dog": np.full(4, 2.0)}
    vocab, matrix = build_embedding_matrix_for_vocab(
        ["cat", "missing", "dog"], pretrained, embedding_size=4
    )
    assert vocab == {"<PAD>": 0, "<UNK>": 1, "cat": 2, "dog": 3}
    assert matrix.shape == (4, 4)
    np.testing.assert_allclose(matrix[2], np.ones(4))
    assert (np.abs(matrix[:2]) <= 0.04).all()


# ---------------------------------------------------------------------------
# User-agent OS/device extraction (reference nar_module/nar/utils.py:145-180)
# ---------------------------------------------------------------------------

UA_CASES = [
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 10_3 like Mac OS X) AppleWebKit/603.1.30"
     " (KHTML, like Gecko) Version/10.0 Mobile/14E277 Safari/602.1", "iOS", "Mobile"),
    ("Mozilla/5.0 (iPad; CPU OS 9_3_5 like Mac OS X) AppleWebKit/601.1.46", "iOS", "Tablet"),
    ("Mozilla/5.0 (Linux; Android 7.0; SM-G930V Build/NRD90M) AppleWebKit/537.36"
     " (KHTML, like Gecko) Chrome/59.0.3071.125 Mobile Safari/537.36", "Android", "Mobile"),
    ("Mozilla/5.0 (Linux; Android 6.0.1; SHIELD Tablet K1 Build/MRA58K)", "Android", "Tablet"),
    ("Mozilla/5.0 (Windows Phone 10.0; Android 6.0.1; Microsoft; Lumia 950)"
     " AppleWebKit/537.36 IEMobile/11.0", "Windows Phone", "Mobile"),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
     " (KHTML, like Gecko) Chrome/60.0.3112.113 Safari/537.36", "Windows", "Desktop"),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_12_6) AppleWebKit/603.3.8", "Mac OS X", "Desktop"),
    ("Mozilla/5.0 (X11; CrOS x86_64 9592.96.0) AppleWebKit/537.36", "Chrome OS", "Desktop"),
    ("Mozilla/5.0 (SymbianOS/9.4; Series60/5.0 NokiaN97-1/20.0.019)", "Symbian OS", "Mobile"),
    ("Mozilla/5.0 (BB10; Touch) AppleWebKit/537.35+ (KHTML, like Gecko)"
     " Version/10.3.3.2205 Mobile Safari/537.35+", "BlackBerry OS", "Mobile"),
    ("Mozilla/5.0 (Mobile; rv:26.0) Gecko/26.0 Firefox/26.0", "Firefox OS", "Mobile"),
    ("Mozilla/5.0 (SMART-TV; Linux; Tizen 2.4.0) AppleWebkit/538.1", "Samsung", "TV"),
    ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko)"
     " Chrome/60.0.3112.90 Safari/537.36 CrKey/1.27.74607", "Chromecast", "TV"),
    ("Mozilla/5.0 (webOS/2.2.4; U; en-US) AppleWebKit/534.6", "webOS", "Mobile"),
    ("curl/7.54.0", "Other", "Desktop"),
    ("", "Other", "Desktop"),
    (None, "Other", "Desktop"),
]


def test_extract_os_from_user_agent():
    from chameleon_recsys_tpu.data.preprocessing.user_agent import (
        OS_LIST,
        extract_os_from_user_agent,
    )

    for ua, expected_os, _ in UA_CASES:
        got = extract_os_from_user_agent(ua)
        assert got == expected_os, (ua, got, expected_os)
        assert got == "Other" or got in OS_LIST


def test_extract_device_group_from_user_agent():
    from chameleon_recsys_tpu.data.preprocessing.user_agent import (
        extract_device_group_from_user_agent,
    )

    for ua, _, expected_group in UA_CASES:
        got = extract_device_group_from_user_agent(ua)
        assert got == expected_group, (ua, got, expected_group)


def test_extract_domain_from_url():
    from chameleon_recsys_tpu.data.preprocessing.user_agent import (
        extract_domain_from_url,
    )

    # group(0) semantics like the reference (includes matched prefix)
    assert extract_domain_from_url("http://www.adressa.no/nyheter/x") == (
        "http://www.adressa.no"
    )
    assert extract_domain_from_url("adressa.no/x") == "adressa.no"
    assert extract_domain_from_url("") is None


def test_enrich_click_context_with_user_agent():
    from chameleon_recsys_tpu.data.preprocessing.user_agent import (
        enrich_click_context_with_user_agent,
    )

    ctx = enrich_click_context_with_user_agent(
        {"user_agent": UA_CASES[0][0], "city": 3}
    )
    assert ctx["os"] == "iOS" and ctx["device"] == "Mobile" and ctx["city"] == 3
    # existing parsed columns are never overwritten
    ctx2 = enrich_click_context_with_user_agent(
        {"user_agent": UA_CASES[0][0], "os": "preparsed"}
    )
    assert ctx2["os"] == "preparsed"
