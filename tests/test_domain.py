"""Domain type and wire-format parity tests.

Validates that queue payloads round-trip with the Go-compatible capitalized
keys (reference: internal/domain/task.go has no json tags, so Go emits
"ID"/"ImageID"/... — see SURVEY.md §2 'Task types').
"""

import json

from imageprocessor_tpu.domain import (
    DEFAULT_JPEG_QUALITY,
    DEFAULT_MAX_UPLOAD_SIZE,
    DEFAULT_THUMBNAIL_SIZE,
    DEFAULT_WATERMARK_OPACITY,
    DEFAULT_WATERMARK_TEXT,
    KAFKA_GROUP_ID,
    KAFKA_TOPIC_PROCESSING,
    KAFKA_TOPIC_RESULTS,
    ImageFormat,
    ImageStatus,
    OperationParams,
    OperationType,
    ProcessingResult,
    ProcessingTask,
    WatermarkPosition,
)


def test_constants_match_reference():
    assert DEFAULT_MAX_UPLOAD_SIZE == 32 << 20
    assert DEFAULT_THUMBNAIL_SIZE == 200
    assert DEFAULT_JPEG_QUALITY == 85
    assert DEFAULT_WATERMARK_TEXT == "© ImageProcessor"
    assert DEFAULT_WATERMARK_OPACITY == 0.5
    assert KAFKA_TOPIC_PROCESSING == "image-processing"
    assert KAFKA_TOPIC_RESULTS == "image-processed"
    assert KAFKA_GROUP_ID == "image-processor-group"


def test_enums_match_reference():
    assert {s.value for s in ImageStatus} == {
        "uploaded", "processing", "completed", "failed", "deleted"}
    assert {o.value for o in OperationType} == {
        "resize", "thumbnail", "watermark", "crop", "rotate", "flip", "grayscale"}
    assert {f.value for f in ImageFormat} == {
        "jpeg", "jpg", "png", "gif", "webp", "bmp", "tiff"}
    assert {p.value for p in WatermarkPosition} == {
        "top-left", "top-right", "top-center", "bottom-left", "bottom-right",
        "bottom-center", "center"}


def test_task_wire_format_uses_go_field_names():
    task = ProcessingTask(
        id="t1",
        image_id="i1",
        original_path="original/2026/08/16/1.jpg",
        bucket="images",
        operations=[
            OperationParams(OperationType.THUMBNAIL, {"size": 200, "crop_to_fit": True}),
            OperationParams(OperationType.RESIZE,
                            {"width": 1024, "height": 768, "keep_aspect": True}),
        ],
        format="jpeg",
    )
    obj = json.loads(task.to_json())
    assert set(obj) == {"ID", "ImageID", "OriginalPath", "Bucket", "Operations", "Format"}
    assert obj["Operations"][0] == {
        "Type": "thumbnail", "Parameters": {"size": 200, "crop_to_fit": True}}

    back = ProcessingTask.from_json(task.to_json())
    assert back == task


def test_task_accepts_go_produced_payload():
    # Shape exactly as Go's encoding/json would emit it for the default upload
    go_payload = json.dumps({
        "ID": "abc", "ImageID": "img-1", "OriginalPath": "original/x.png",
        "Bucket": "images", "Operations": [
            {"Type": "watermark", "Parameters": {
                "text": "hi", "opacity": 0.5, "position": "bottom-right"}},
        ], "Format": "png",
    })
    task = ProcessingTask.from_json(go_payload)
    assert task.image_id == "img-1"
    assert task.operations[0].type is OperationType.WATERMARK
    assert task.operations[0].parameters["position"] == "bottom-right"


def test_result_wire_roundtrip():
    res = ProcessingResult(
        id="t1", image_id="i1", status=ImageStatus.COMPLETED,
        processed_paths={"resize": "processed/resize/i1/1024x768.jpeg"})
    obj = json.loads(res.to_json())
    assert set(obj) == {"ID", "ImageID", "Status", "ProcessedPaths", "Error"}
    assert ProcessingResult.from_json(res.to_json()) == res
