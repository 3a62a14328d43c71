"""In-the-wild lip-ROI extraction: mp4 → 88×88 grayscale mouth crops @25 fps.

Counterpart of the reference ``RTFSNet_file.py:7-133``: ffmpeg re-samples to
25 fps, mediapipe detects the face + dense mesh, the face is rotated/scaled
so the eye line is horizontal (eye landmarks 130/359, left eye anchored at
(0.35, 0.35) of a 256px canvas), and the lip bounding box (mesh indices
187/411/136/365) is cropped and resized to 88×88 grayscale.

``cv2`` / ``mediapipe`` are OPTIONAL runtime deps (imported lazily with a
clear error): this path is offline CPU preprocessing, not the TPU hot path.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

LIP_INDICES = (187, 411, 136, 365)
LEFT_EYE_IDX, RIGHT_EYE_IDX = 130, 359


def _require(module_name: str):
    try:
        return __import__(module_name)
    except ImportError as e:
        raise ImportError(
            f"lip extraction needs the optional dependency '{module_name}' "
            f"(offline CPU preprocessing only; pip install {module_name})"
        ) from e


def convert_video_to_25fps(input_path: str, output_path: str):
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", input_path, "-r", "25",
         output_path],
        check=True,
    )


def align_face(image, landmarks, desired_left_eye=(0.35, 0.35),
               desired_face_width=256, desired_face_height=None):
    """Rotate+scale so the eye line is horizontal; returns (aligned, M)."""
    cv2 = _require("cv2")
    if desired_face_height is None:
        desired_face_height = desired_face_width
    lx, ly = landmarks[LEFT_EYE_IDX]
    rx, ry = landmarks[RIGHT_EYE_IDX]
    d_y, d_x = ry - ly, rx - lx
    angle = np.degrees(np.arctan2(d_y, d_x))
    dist = np.hypot(d_x, d_y)
    desired_dist = (1.0 - 2 * desired_left_eye[0]) * desired_face_width
    scale = desired_dist / max(dist, 1e-6)
    eyes_center = ((lx + rx) // 2, (ly + ry) // 2)
    m = cv2.getRotationMatrix2D(eyes_center, angle, scale)
    m[0, 2] += desired_face_width * 0.5 - eyes_center[0]
    m[1, 2] += desired_face_height * desired_left_eye[1] - eyes_center[1]
    out = cv2.warpAffine(image, m, (desired_face_width, desired_face_height),
                         flags=cv2.INTER_CUBIC)
    return out, m


def _transform_landmarks(landmarks, m):
    pts = np.asarray(landmarks, np.float64)
    ones = np.ones((len(pts), 1))
    out = np.concatenate([pts, ones], axis=1) @ m.T
    return out.astype(np.int64)


def get_video_crops(video_path: str) -> np.ndarray:
    """mp4 → (T, 88, 88) grayscale lip crops at 25 fps."""
    cv2 = _require("cv2")
    mp = _require("mediapipe")

    face_detection = mp.solutions.face_detection.FaceDetection(
        model_selection=1, min_detection_confidence=0.5
    )
    face_mesh = mp.solutions.face_mesh.FaceMesh(
        static_image_mode=False, max_num_faces=1,
        min_detection_confidence=0.2, refine_landmarks=True,
    )

    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as tmp:
        tmp_path = tmp.name
    try:
        convert_video_to_25fps(video_path, tmp_path)
        cap = cv2.VideoCapture(tmp_path)
        crops = []
        while cap.isOpened():
            ret, frame = cap.read()
            if not ret:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            det = face_detection.process(rgb)
            if not det.detections:
                continue
            for detection in det.detections:
                bbox = detection.location_data.relative_bounding_box
                ih, iw = frame.shape[:2]
                x, y = int(bbox.xmin * iw), int(bbox.ymin * ih)
                w, h = int(bbox.width * iw), int(bbox.height * ih)
                if x < 0 or y < 0 or w <= 0 or h <= 0:
                    continue
                face = cv2.resize(frame[y : y + h, x : x + w], (400, 400))
                mesh = face_mesh.process(cv2.cvtColor(face, cv2.COLOR_BGR2RGB))
                if not mesh.multi_face_landmarks:
                    continue
                for lms in mesh.multi_face_landmarks:
                    pts = [
                        (int(p.x * face.shape[1]), int(p.y * face.shape[0]))
                        for p in lms.landmark
                    ]
                    aligned, m = align_face(face, pts)
                    tpts = _transform_landmarks(pts, m)
                    lip_pts = np.array([tpts[i] for i in LIP_INDICES])
                    x2, y2, w2, h2 = cv2.boundingRect(lip_pts)
                    lips = aligned[y2 : y2 + h2, x2 : x2 + w2]
                    if lips.size == 0:
                        continue
                    lips = cv2.resize(lips, (88, 88))
                    crops.append(cv2.cvtColor(lips, cv2.COLOR_BGR2GRAY))
        cap.release()
        face_mesh.close()
        face_detection.close()
    finally:
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
    return np.asarray(crops)
