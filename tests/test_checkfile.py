"""Unit tests for the check-file surface (S3/M2/M3) — format sniffing
per cfg.rs:162-183, default UDF per cfg.rs:344-346, Side RESULT
semantics per backend.rs:173-183."""

import json

import pyarrow as pa
import pytest

from doonop_ray.functions.checkfile import (
    DEFAULT_JS,
    CheckFileError,
    JsCheck,
    SideCheck,
    default_extractor,
    load_check_file,
)

PAGES = pa.table({
    "url": pa.array(["https://h0.example.com/p/1"]),
    "data": pa.array(['{"x": 1}']),
    "links": pa.array([[]], pa.list_(pa.string())),
    "image_id": pa.array([None], pa.string()),
})


def one(check):
    return json.loads(check(PAGES).to_pylist()[0])


def test_default_udf_returns_url():
    assert one(default_extractor()) == "https://h0.example.com/p/1"
    assert DEFAULT_JS == "return window.location.href"


def test_js_location_parts_and_literals():
    assert one(JsCheck("return window.location.hostname")) == "h0.example.com"
    assert one(JsCheck("return window.location.pathname")) == "/p/1"
    assert one(JsCheck("return 42;")) == 42
    assert one(JsCheck('return "lit"')) == "lit"
    assert one(JsCheck("return document.body.innerText")) == '{"x": 1}'


def test_js_unsupported_raises():
    with pytest.raises(CheckFileError):
        one(JsCheck("return document.cookie"))
    with pytest.raises(CheckFileError):
        one(JsCheck("window.alert(1)"))


def side_doc(commands):
    return json.dumps({"tests": [{"commands": commands}]})


def test_side_store_result():
    c = SideCheck(side_doc([
        {"command": "store", "target": "THE RESULT", "value": "RESULT"},
    ]))
    assert one(c) == "THE RESULT"


def test_side_result_null_when_unset():
    # backend.rs:173-183: RESULT unset -> Null
    c = SideCheck(side_doc([
        {"command": "store", "target": "x", "value": "OTHER"},
    ]))
    assert one(c) is None


def test_side_variable_interpolation_and_execute_script():
    c = SideCheck(side_doc([
        {"command": "store", "target": "world", "value": "W"},
        {"command": "store", "target": "hello ${W}", "value": "RESULT"},
    ]))
    assert one(c) == "hello world"
    c2 = SideCheck(side_doc([
        {"command": "executeScript",
         "target": "return window.location.href", "value": "RESULT"},
    ]))
    assert one(c2) == "https://h0.example.com/p/1"


def test_side_unsupported_command_raises():
    with pytest.raises(NotImplementedError):
        SideCheck(side_doc([{"command": "click", "target": "css=a"}]))


def test_format_sniffing(tmp_path):
    js = tmp_path / "a.js"
    js.write_text("return 1")
    side = tmp_path / "b.side"
    side.write_text(side_doc([]))
    jsn = tmp_path / "c.json"
    jsn.write_text(side_doc([]))
    other = tmp_path / "d.txt"
    other.write_text("return 1")
    assert isinstance(load_check_file(str(js)), JsCheck)
    assert isinstance(load_check_file(str(side)), SideCheck)
    assert isinstance(load_check_file(str(jsn)), SideCheck)
    # explicit format overrides the extension (cfg.rs:168-170)
    assert isinstance(load_check_file(str(other), fmt="js"), JsCheck)
    assert isinstance(load_check_file(str(jsn), fmt="side"), SideCheck)
    with pytest.raises(CheckFileError):
        load_check_file(str(other))


def test_side_store_text_and_assert_text():
    c = SideCheck(side_doc([
        {"command": "storeText", "target": "css=body", "value": "RESULT"},
    ]))
    assert one(c) == '{"x": 1}'
    # passing assertText: body equals the literal payload
    c2 = SideCheck(side_doc([
        {"command": "assertText", "target": "css=body",
         "value": '{"x": 1}'},
        {"command": "store", "target": "ok", "value": "RESULT"},
    ]))
    assert one(c2) == "ok"


def test_side_assert_variable():
    from doonop_ray.functions.checkfile import SideAssertError

    c = SideCheck(side_doc([
        {"command": "store", "target": "42", "value": "N"},
        {"command": "assert", "target": "N", "value": "42"},
        {"command": "store", "target": "passed ${N}", "value": "RESULT"},
    ]))
    assert one(c) == "passed 42"
    bad = SideCheck(side_doc([
        {"command": "store", "target": "42", "value": "N"},
        {"command": "assert", "target": "N", "value": "41"},
    ]))
    with pytest.raises(SideAssertError):
        one(bad)
    badtext = SideCheck(side_doc([
        {"command": "assertText", "target": "tag=body",
         "value": "not the body"},
    ]))
    with pytest.raises(SideAssertError):
        one(badtext)


def test_side_text_commands_need_body_locator():
    # a real-DOM locator cannot resolve without a browser: load-time
    # NotImplementedError, same honesty contract as the click commands
    with pytest.raises(NotImplementedError):
        SideCheck(side_doc([
            {"command": "storeText", "target": "css=.item", "value": "T"},
        ]))
    with pytest.raises(NotImplementedError):
        SideCheck(side_doc([
            {"command": "assertText", "target": "id=main", "value": "x"},
        ]))
