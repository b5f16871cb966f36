"""Corpus walk tests: synthetic trees in each corpus's public layout.

Each walk_* generator re-provides a reference parser (Parsers/<name>.py);
these tests pin the layout each walk expects (file naming, transcript
format, speaker derivation) so regressions are caught without the real
corpora (which are not in the image).
"""
import json
import os

import pytest

import fscl_tpu.data.parsers  # noqa: F401 (populate registry)
from fscl_tpu.core.registry import RAW_PARSERS


def touch(path, content=b""):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(content, bytes) else "w"
    with open(path, mode) as f:
        f.write(content)


def test_ljspeech(tmp_path):
    root = str(tmp_path)
    touch(os.path.join(root, "metadata.csv"),
          "LJ001-0001|raw|Printing, in the only sense\n\nLJ001-0002|r|missing wav\n")
    touch(os.path.join(root, "wavs", "LJ001-0001.wav"))
    items = list(RAW_PARSERS.get("LJSpeech")(root))
    assert len(items) == 1
    q, wav, text = items[0]
    assert q == {"spk": "LJSpeech", "basename": "LJ001-0001"}
    # trailing period appended when transcript ends with a letter
    assert text.endswith("sense.")
    assert wav.endswith("wavs/LJ001-0001.wav")


def test_libritts(tmp_path):
    root = str(tmp_path)
    base = os.path.join(root, "train-clean-100", "103", "1241")
    touch(os.path.join(base, "103_1241_000000_000001.wav"))
    touch(os.path.join(base, "103_1241_000000_000001.normalized.txt"),
          "hello there\n")
    touch(os.path.join(base, "103_1241_000000_000002.wav"))  # no txt -> skip
    items = list(RAW_PARSERS.get("LibriTTS")(root))
    assert len(items) == 1
    q, wav, text = items[0]
    assert q["spk"] == "103" and text == "hello there"


def test_css10(tmp_path):
    root = str(tmp_path / "german")
    touch(os.path.join(root, "achtgesichterambiwasse", "a_0000.wav"))
    touch(os.path.join(root, "transcript.txt"),
          "achtgesichterambiwasse/a_0000.wav|raw|Es war einmal|4.2\n")
    items = list(RAW_PARSERS.get("CSS10")(root))
    assert len(items) == 1
    q, _, text = items[0]
    # speaker derived from the language directory name
    assert q["spk"] == "css10-de"
    assert q["basename"] == "css10-de-a_0000"
    assert text == "Es war einmal"


def test_kss(tmp_path):
    root = str(tmp_path)
    touch(os.path.join(root, "1", "1_0000.wav"))
    touch(os.path.join(root, "transcript.v.1.4.txt"),
          "1/1_0000.wav|raw|text here|expanded|decomposed|english\n")
    items = list(RAW_PARSERS.get("KSS")(root))
    assert len(items) == 1
    q, _, text = items[0]
    assert q == {"spk": "kss", "basename": "kss-1_0000"}
    assert text == "text here"


def test_jsut(tmp_path):
    root = str(tmp_path)
    touch(os.path.join(root, "basic5000", "wav", "BASIC5000_0001.wav"))
    touch(os.path.join(root, "basic5000", "transcript_utf8.txt"),
          "BASIC5000_0001:text:with:colons\n")
    items = list(RAW_PARSERS.get("JSUT")(root))
    assert len(items) == 1
    q, _, text = items[0]
    assert q["basename"] == "BASIC5000_0001"
    # only the first colon splits name from text
    assert text == "text:with:colons"


def test_aishell3(tmp_path):
    root = str(tmp_path)
    header = "".join(f"# header {i}\n" for i in range(5))
    touch(os.path.join(root, "train", "label_train-set.txt"),
          header + "SSB00050001|pinyin|text %with$ marks\n")
    touch(os.path.join(root, "train", "wav", "SSB0005", "SSB00050001.wav"))
    items = list(RAW_PARSERS.get("AISHELL-3")(root))
    assert len(items) == 1
    q, _, text = items[0]
    # speaker = utterance name minus the 4-digit index
    assert q["spk"] == "SSB0005"
    assert text == "text with marks"


def test_csmsc(tmp_path):
    root = str(tmp_path)
    touch(os.path.join(root, "ProsodyLabeling", "000001-010000.txt"),
          "000001\t1#2text#3here\n\tka2 er2\n")
    touch(os.path.join(root, "Wave", "000001.wav"))
    items = list(RAW_PARSERS.get("CSMSC")(root))
    assert len(items) == 1
    q, _, text = items[0]
    assert q["basename"] == "csmsc-000001"
    # prosody boundary marks #N are stripped; pinyin line ignored
    assert text == "1texthere"


def test_mailabs(tmp_path):
    root = str(tmp_path / "de_DE")
    book = os.path.join(root, "by_book", "female", "angela", "book1")
    touch(os.path.join(book, "metadata.csv"), "u1|raw|normalized text\n")
    touch(os.path.join(book, "wavs", "u1.wav"))
    items = list(RAW_PARSERS.get("M-AILABS")(root))
    assert len(items) == 1
    q, _, text = items[0]
    assert q["spk"] == "angela" and text == "normalized text"


def test_mailabs_fr_quirk(tmp_path):
    # fr_FR puts gender dirs at top level (no by_book/)
    root = str(tmp_path / "fr_FR")
    book = os.path.join(root, "male", "bernard", "livre")
    touch(os.path.join(book, "metadata.csv"), "u2|raw|bonjour\n")
    touch(os.path.join(book, "wavs", "u2.wav"))
    items = list(RAW_PARSERS.get("M-AILABS")(root))
    assert len(items) == 1
    assert items[0][0]["spk"] == "bernard"


def test_alffa_sw(tmp_path):
    root = str(tmp_path)
    sdir = os.path.join(root, "data_broadcastnews_sw", "data", "train")
    # swahili: no utt2spk -> speaker = basename[:15]
    touch(os.path.join(sdir, "text"), "SWH-05-20101106_00001\thabari za leo\n")
    touch(os.path.join(sdir, "wav", "SWH-05-20101106",
                       "SWH-05-20101106_00001.wav"))
    items = list(RAW_PARSERS.get("ALFFA")(root))
    assert len(items) == 1
    q, _, text = items[0]
    assert q["spk"] == "SWH-05-20101106"
    assert text == "habari za leo"


def test_alffa_am(tmp_path):
    root = str(tmp_path)
    sdir = os.path.join(root, "data_readspeech_am", "data", "train")
    touch(os.path.join(sdir, "text"), "utt001 selam new\n")
    touch(os.path.join(sdir, "utt2spk"), "utt001 spkA\n")
    touch(os.path.join(sdir, "wav", "utt001.wav"))
    items = list(RAW_PARSERS.get("ALFFA")(root, lang="am"))
    assert len(items) == 1
    q, _, text = items[0]
    assert q["spk"] == "spkA" and text == "selam new"


def test_globalphone(tmp_path):
    root = str(tmp_path)
    touch(os.path.join(root, "wav", "CZ001_1.wav"))
    touch(os.path.join(root, "corpus", "CZ001_1.lab"), "dobry den\n")
    touch(os.path.join(root, "wav", "CZ002_9.wav"))  # no lab -> skip
    items = list(RAW_PARSERS.get("GlobalPhone")(root))
    assert len(items) == 1
    q, _, text = items[0]
    # speaker from the filename prefix; '_' normalized to '-' in basename
    assert q == {"spk": "CZ001", "basename": "CZ001-1"}
    assert text == "dobry den"


def test_lad(tmp_path):
    root = str(tmp_path)
    touch(os.path.join(root, "48000_orig", "spk1_a0001.wav"))
    xml = ("<recording_script><fileid id=\"a0001\">hello world</fileid>"
           "<fileid id=\"a0002\">missing</fileid></recording_script>")
    touch(os.path.join(root, "en_us", "spk1", "text.xml"), xml)
    items = list(RAW_PARSERS.get("LAD")(root))
    assert len(items) == 1
    q, _, text = items[0]
    assert q == {"spk": "spk1", "basename": "spk1_a0001"}
    assert text == "hello world"


def test_tat_tts(tmp_path):
    root = str(tmp_path)
    pdir = os.path.join(root, "spkT", "partA")
    touch(os.path.join(pdir, "u1.wav"))
    touch(os.path.join(pdir, "u1.json"),
          json.dumps({"台羅數字調": "li2 ho2"}, ensure_ascii=False))
    touch(os.path.join(pdir, "u2.wav"))  # no json -> skip
    items = list(RAW_PARSERS.get("TAT_TTS")(root))
    assert len(items) == 1
    q, _, text = items[0]
    # data_info carries partition like the reference (TAT_TTS.py:31-35)
    assert q == {"spk": "spkT", "basename": "u1", "partition": "partA"}
    assert text == "li2 ho2"


def test_tat_tts_realistic_layout(tmp_path):
    """TAT-TTS corpus shape: several speakers x condition partitions, json
    labels carrying the full annotation set (we use 台羅數字調 only), stray
    non-directory entries at both levels."""
    root = str(tmp_path)
    labels = {
        "台羅": "lí-hó",
        "台羅數字調": "li2 ho2",
        "漢羅台文": "你好",
        "華文": "你好",
    }
    for spk in ("TTS_F1", "TTS_M2"):
        for part in ("android_mobile", "condenser", "lavalier"):
            for utt in ("0001-2.2", "0003-1.1"):
                base = f"{spk}_{part}_{utt}"
                pdir = os.path.join(root, spk, part)
                touch(os.path.join(pdir, base + ".wav"))
                touch(os.path.join(pdir, base + ".json"),
                      json.dumps(labels, ensure_ascii=False))
    touch(os.path.join(root, "README.txt"), "not a speaker dir")
    touch(os.path.join(root, "TTS_F1", "notes.md"), "not a partition dir")
    items = list(RAW_PARSERS.get("TAT_TTS")(root))
    assert len(items) == 12
    assert {q["spk"] for q, _, _ in items} == {"TTS_F1", "TTS_M2"}
    assert {q["partition"] for q, _, _ in items} == {
        "android_mobile", "condenser", "lavalier"}
    assert all(t == "li2 ho2" for _, _, t in items)
    # spk-basename keys (FeatureStore identity) must be unique
    keys = [f"{q['spk']}-{q['basename']}" for q, _, _ in items]
    assert len(set(keys)) == len(keys)


def test_globalphone_realistic_layout(tmp_path):
    """GlobalPhone preprocessed shape the reference expects: flat wav/ dir
    of <SPK>_<utt>.wav (3-digit speaker ids) + corpus/<SPK>_<utt>.lab
    transcripts; multiple speakers, multi-line labs (first line only)."""
    root = str(tmp_path)
    for spk in ("CZ031", "CZ047", "CZ102"):
        for utt in ("1", "12", "123"):
            base = f"{spk}_{utt}"
            touch(os.path.join(root, "wav", base + ".wav"))
            touch(os.path.join(root, "corpus", base + ".lab"),
                  f"prepis vety {utt}\ndruhy radek se ignoruje\n")
    items = list(RAW_PARSERS.get("GlobalPhone")(root))
    assert len(items) == 9
    q0, wav0, text0 = items[0]
    assert q0 == {"spk": "CZ031", "basename": "CZ031-1"}
    assert text0 == "prepis vety 1"
    assert wav0.endswith(os.path.join("wav", "CZ031_1.wav"))
    # only the first lab line is the transcript (globalphone.py:30-31)
    assert all("radek" not in t for _, _, t in items)
    keys = [f"{q['spk']}-{q['basename']}" for q, _, _ in items]
    assert len(set(keys)) == len(keys)


def test_registry_has_all_13():
    for name in ("LJSpeech", "LibriTTS", "CSS10", "KSS", "JSUT", "AISHELL-3",
                 "CSMSC", "M-AILABS", "ALFFA", "GlobalPhone", "LAD", "TAT_TTS"):
        assert RAW_PARSERS.get(name) is not None
