"""Label parsing tests (mirrors reference src/labels.rs:124-359 coverage)."""

import pytest

from birdnet_tpu.errors import LabelLoadError, LabelParseError
from birdnet_tpu.labels import load_labels_from_file, parse_labels
from birdnet_tpu.types import LabelFormat, ModelType


# --- Text format ---


def test_text_basic():
    assert parse_labels("a\nb\nc", LabelFormat.TEXT) == ["a", "b", "c"]


def test_text_trims_and_skips_blank():
    content = "  Turdus merula_Common Blackbird  \n\n\t\nParus major_Great Tit\n"
    assert parse_labels(content, LabelFormat.TEXT) == [
        "Turdus merula_Common Blackbird",
        "Parus major_Great Tit",
    ]


def test_text_unicode():
    content = "Sérin cini\nMésange bleue\n燕雀\n"
    assert parse_labels(content, LabelFormat.TEXT) == [
        "Sérin cini",
        "Mésange bleue",
        "燕雀",
    ]


def test_text_empty():
    assert parse_labels("", LabelFormat.TEXT) == []


def test_text_windows_line_endings():
    assert parse_labels("a\r\nb\r\n", LabelFormat.TEXT) == ["a", "b"]


# --- CSV format ---


def test_csv_first_column():
    content = "Sturnus vulgaris,European Starling\nPica pica,Eurasian Magpie\n"
    assert parse_labels(content, LabelFormat.CSV) == ["Sturnus vulgaris", "Pica pica"]


def test_csv_skips_header_label():
    content = "label,common\na,1\nb,2\n"
    assert parse_labels(content, LabelFormat.CSV) == ["a", "b"]


@pytest.mark.parametrize(
    "header",
    ["species", "NAME", "Class", "common_name", "scientific_name", "Label"],
)
def test_csv_header_variants(header):
    content = f"{header},x\nfoo,1\n"
    assert parse_labels(content, LabelFormat.CSV) == ["foo"]


def test_csv_perch_header_heuristics():
    # Perch v2 dataset identifiers treated as headers (labels.rs:91-92)
    assert parse_labels("inat2024_fsd50k\nfoo\n", LabelFormat.CSV) == ["foo"]
    assert parse_labels("something_fsd50k\nbar\n", LabelFormat.CSV) == ["bar"]
    assert parse_labels("inatXYZ,other\nbaz,1\n", LabelFormat.CSV) == ["baz"]


def test_csv_non_header_first_row_kept():
    content = "Anas platyrhynchos,Mallard\nCorvus corax,Raven\n"
    assert parse_labels(content, LabelFormat.CSV) == [
        "Anas platyrhynchos",
        "Corvus corax",
    ]


def test_csv_quoted_fields():
    content = '"Smith, John",note\nplain,x\n'
    assert parse_labels(content, LabelFormat.CSV) == ["Smith, John", "plain"]


def test_csv_flexible_widths():
    content = "one\ntwo,2\nthree,3,III\n"
    assert parse_labels(content, LabelFormat.CSV) == ["one", "two", "three"]


def test_csv_skips_empty_first_column():
    content = "a,1\n,2\nb,3\n"
    assert parse_labels(content, LabelFormat.CSV) == ["a", "b"]


def test_csv_header_only_in_first_row():
    # "label" appearing later is a real value, not a header
    content = "a,1\nlabel,2\n"
    assert parse_labels(content, LabelFormat.CSV) == ["a", "label"]


# --- JSON format ---


def test_json_array_of_strings():
    assert parse_labels('["a", "b", "c"]', LabelFormat.JSON) == ["a", "b", "c"]


def test_json_labels_object():
    assert parse_labels('{"labels": ["x", "y"]}', LabelFormat.JSON) == ["x", "y"]


def test_json_array_of_objects_name():
    content = '[{"name": "a"}, {"name": "b"}]'
    assert parse_labels(content, LabelFormat.JSON) == ["a", "b"]


def test_json_array_of_objects_label_and_species_keys():
    content = '[{"label": "a"}, {"species": "b"}, {"name": "c"}]'
    assert parse_labels(content, LabelFormat.JSON) == ["a", "b", "c"]


def test_json_invalid_raises():
    with pytest.raises(LabelParseError):
        parse_labels("{not json", LabelFormat.JSON)
    with pytest.raises(LabelParseError):
        parse_labels('{"other": 1}', LabelFormat.JSON)
    with pytest.raises(LabelParseError):
        parse_labels("42", LabelFormat.JSON)


# --- file loading ---


def test_load_labels_from_file(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("a\nb\n", encoding="utf-8")
    assert load_labels_from_file(p, ModelType.BIRDNET_V24) == ["a", "b"]


def test_load_labels_csv_for_v30(tmp_path):
    p = tmp_path / "labels.csv"
    p.write_text("species,common\nfoo,Foo\n", encoding="utf-8")
    assert load_labels_from_file(p, ModelType.BIRDNET_V30) == ["foo"]


def test_load_labels_missing_file():
    with pytest.raises(LabelLoadError) as ei:
        load_labels_from_file("/nonexistent/labels.txt", ModelType.BIRDNET_V24)
    assert "failed to load labels from /nonexistent/labels.txt" in str(ei.value)


def test_reference_label_data_parses():
    """Parse the real label assets mounted with the reference (if present)."""
    import os

    v24 = "/root/reference/data/labels/birdnet_v2.4/BirdNET_GLOBAL_6K_V2.4_Labels_en_uk.txt"
    perch = "/root/reference/data/labels/perch_v2/labels.csv"
    if not (os.path.exists(v24) and os.path.exists(perch)):
        pytest.skip("reference label data not mounted")
    labels = load_labels_from_file(v24, ModelType.BIRDNET_V24)
    assert len(labels) == 6522  # canonical v2.4 species count (SURVEY §0)
    perch_labels = load_labels_from_file(perch, ModelType.PERCH_V2)
    assert len(perch_labels) == 14795  # canonical Perch v2 class count
