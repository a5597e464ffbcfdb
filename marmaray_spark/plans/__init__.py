"""Job orchestration: JobDag / JobSubDag / JobManager on a shared session."""
