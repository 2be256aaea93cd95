# rpe_tpu — TPU-native relative pose estimation framework.
#
# Mirrors the reference's packaging role (reference Dockerfile: python-slim +
# OpenCV system libs + generic ENTRY_FILE dispatch) for the CPU/host parts;
# on real TPU hosts use a libtpu-enabled JAX base image instead.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY rpe_tpu/ ./rpe_tpu/
COPY tests/ ./tests/
COPY bench.py __graft_entry__.py ./

# Pre-build the native loader
RUN python -c "from rpe_tpu.io.native import _build; _build()"

# Generic module dispatch, same pattern as the reference:
#   docker run -e ENTRY_FILE=rpe_tpu.cli.run_simulator_data image
ENV ENTRY_FILE=rpe_tpu.cli.run_single_pair
CMD ["sh", "-c", "python -m $ENTRY_FILE"]
