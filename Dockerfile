# Processor image for the docker-compose smoke. The dev container this
# repo is built in has pyspark/java preinstalled and no Docker daemon, so
# this file exists for external environments running `docker compose up`.
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip curl \
    && rm -rf /var/lib/apt/lists/*

RUN pip3 install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy nats-py

WORKDIR /app
COPY nats_stream_processor_spark /app/nats_stream_processor_spark

ENV PYTHONUNBUFFERED=1
CMD ["python3", "-m", "nats_stream_processor_spark", "--checkpoint", "/tmp/checkpoints"]
