from lidar_object_detection_tpu.pipelines.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
