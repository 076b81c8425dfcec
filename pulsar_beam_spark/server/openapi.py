"""OpenAPI 3.0 spec for the gateway — reference src/docs/api.go parity.

The reference documents its HTTP surface with go-swagger annotations
(src/docs/api.go:8-224: one swagger:operation per endpoint with the
exact response-code map, SSE/poll query parameters, and TopicConfig /
errorResponse schemas).  This module builds the same contract as an
OpenAPI 3.0 document at runtime from the app's *bound* route table, so
the spec can never drift from what is actually served: documented
operations carry api.go's codes/params verbatim, and any bound route
without a documented entry gets a generic stub (so new routes are never
silently undocumented).

Served at ``GET /v2/docs/openapi.json`` in every mode (the docs analogue
of the reference shipping src/docs with every build).
"""

from __future__ import annotations

import re

# query params shared by the consume endpoints (api.go:44-103: SSE and
# poll document the same subscription triple; poll adds batchSize)
_SUB_PARAMS = [
    {"name": "SubscriptionInitialPosition", "in": "query", "required": False,
     "schema": {"type": "string", "enum": ["latest", "earliest"]},
     "description": "subscription initial position; default latest"},
    {"name": "SubscriptionType", "in": "query", "required": False,
     "schema": {"type": "string",
                "enum": ["exclusive", "shared", "keyshared", "failover"]},
     "description": "subscription type; default exclusive"},
    {"name": "SubscriptionName", "in": "query", "required": False,
     "schema": {"type": "string", "minLength": 5},
     "description": "subscription name, minimum 5 characters; a random "
                    "NonResumable name is generated if not specified"},
]

_ERR = {"$ref": "#/components/schemas/errorResponse"}
_TOPIC = {"$ref": "#/components/schemas/TopicConfig"}


def _resp(desc_by_code: dict[int, str], schema_by_code: dict[int, dict] | None = None):
    out = {}
    for code, desc in desc_by_code.items():
        entry: dict = {"description": desc}
        schema = (schema_by_code or {}).get(code)
        if schema:
            entry["content"] = {"application/json": {"schema": schema}}
        out[str(code)] = entry
    return out


# pattern -> {method -> operation}; codes/params mirror api.go line-for-line
_DOCUMENTED: dict[str, dict[str, dict]] = {
    "/v2/firehose/{persistent}/{tenant}/{namespace}/{topic}": {
        "POST": {  # api.go:8-32
            "operationId": "idOfFirehoseEndpoint", "tags": ["Send-Messages"],
            "summary": "Receive a message in the HTTP body and send it to the topic.",
            "responses": _resp({200: "successfully sent messages",
                                401: "authentication failure",
                                422: "invalid request parameters",
                                500: "failed to read the http body",
                                503: "failed to send messages"},
                               {401: _ERR, 422: _ERR, 500: _ERR, 503: _ERR}),
        },
    },
    "/v1/firehose": {
        "POST": {  # header-routed twin of the v2 operation (handlers.go:83-139)
            "operationId": "idOfFirehoseV1", "tags": ["Send-Messages"],
            "summary": "Header-routed produce: topic from the TopicFn/PulsarUrl headers.",
            "parameters": [
                {"name": "TopicFn", "in": "header", "required": True,
                 "schema": {"type": "string"}},
                {"name": "PulsarUrl", "in": "header", "required": False,
                 "schema": {"type": "string"}},
            ],
            "responses": _resp({200: "successfully sent messages",
                                401: "authentication failure",
                                422: "invalid request parameters",
                                503: "failed to send messages"},
                               {401: _ERR, 422: _ERR, 503: _ERR}),
        },
    },
    "/v2/sse/{persistent}/{tenant}/{namespace}/{topic}": {
        "GET": {  # api.go:34-72
            "operationId": "idOfHTTPSeverSentEvent", "tags": ["SSE-Event-Streaming"],
            "summary": "Stream messages from the topic as server-sent events (at most once).",
            "parameters": list(_SUB_PARAMS),
            "responses": _resp({200: "successfully streaming events",
                                401: "authentication failure",
                                422: "invalid request parameters",
                                500: "failed to subscribe"},
                               {401: _ERR, 422: _ERR, 500: _ERR}),
        },
    },
    "/v2/poll/{persistent}/{tenant}/{namespace}/{topic}": {
        "GET": {  # api.go:74-121
            "operationId": "idOfHTTPLongPolling", "tags": ["Long-Polling"],
            "summary": "Batch-poll messages from the topic; 204 when empty.",
            "parameters": list(_SUB_PARAMS) + [
                {"name": "batchSize", "in": "query", "required": False,
                 "schema": {"type": "integer", "default": 10}},
                {"name": "perMessageTimeoutMs", "in": "query", "required": False,
                 "schema": {"type": "integer", "default": 300}},
            ],
            "responses": _resp({200: "successfully received messages",
                                204: "no messages to receive",
                                401: "authentication failure",
                                422: "invalid request parameters",
                                500: "failed to subscribe"},
                               {401: _ERR, 422: _ERR, 500: _ERR}),
        },
    },
    "/v2/topic": {
        "GET": {  # api.go:123-132 (TopicKey in body)
            "operationId": "idOfGetTopic", "tags": ["Get-Topic"],
            "summary": "Get a topic configuration based on the topic name.",
            "requestBody": {"content": {"application/json": {
                "schema": {"$ref": "#/components/schemas/TopicKey"}}}},
            "responses": _resp({200: "topic configuration", 403: "forbidden",
                                404: "not found", 422: "invalid request",
                                500: "server error"},
                               {200: _TOPIC, 404: _ERR, 422: _ERR, 500: _ERR}),
        },
        "POST": {  # api.go:145-154
            "operationId": "idOfUpdateTopic", "tags": ["Create-or-Update-Topic"],
            "summary": "Create or update a topic configuration. Do NOT specify "
                       "key; topic status must be 1 for activation.",
            "requestBody": {"content": {"application/json": {"schema": _TOPIC}}},
            "responses": _resp({201: "topic created/updated", 403: "forbidden",
                                409: "conflict", 422: "invalid request",
                                500: "server error"},
                               {201: _TOPIC, 409: _ERR, 422: _ERR, 500: _ERR}),
        },
        "DELETE": {  # api.go:156-165
            "operationId": "idOfDeleteTopicKey", "tags": ["Delete-Topic"],
            "summary": "Delete a topic configuration based on topic name.",
            "requestBody": {"content": {"application/json": {
                "schema": {"$ref": "#/components/schemas/TopicKey"}}}},
            "responses": _resp({200: "topic deleted", 403: "forbidden",
                                404: "not found", 422: "invalid request",
                                500: "server error"},
                               {200: _TOPIC, 403: _ERR, 404: _ERR, 422: _ERR,
                                500: _ERR}),
        },
    },
    "/v2/topic/{topicKey}": {
        "GET": {  # api.go:134-143
            "operationId": "idOfGetTopicKey", "tags": ["Get-Topic"],
            "summary": "Get a topic configuration based on topic key.",
            "responses": _resp({200: "topic configuration", 403: "forbidden",
                                404: "not found", 422: "invalid request",
                                500: "server error"},
                               {200: _TOPIC, 404: _ERR, 422: _ERR, 500: _ERR}),
        },
        "DELETE": {  # api.go:167-176
            "operationId": "idOfDeleteTopic", "tags": ["Delete-Topic"],
            "summary": "Delete a topic configuration based on topic key.",
            "responses": _resp({200: "topic deleted", 403: "forbidden",
                                404: "not found", 422: "invalid request",
                                500: "server error"},
                               {200: _TOPIC, 403: _ERR, 404: _ERR, 422: _ERR,
                                500: _ERR}),
        },
    },
    "/subject/{sub}": {
        "GET": {  # handlers.go:41-68
            "operationId": "idOfTokenSubject", "tags": ["Token-Server"],
            "summary": "Mint an RS256 JWT for the subject (superrole only).",
            "responses": _resp({200: "token minted",
                                401: "not a superrole", 422: "missing subject"},
                               {401: _ERR, 422: _ERR}),
        },
    },
}

_SCHEMAS = {
    # model.TopicConfig (src/model/topic.go) — the document the CRUD
    # endpoints exchange; mirrors TOPIC_CONFIG_SCHEMA field-for-field
    "TopicConfig": {
        "type": "object",
        "properties": {
            "key": {"type": "string"},
            "topic_full_name": {"type": "string"},
            "pulsar_url": {"type": "string"},
            "token": {"type": "string"},
            "tenant": {"type": "string"},
            "notes": {"type": "string", "nullable": True},
            "topic_status": {"type": "integer",
                             "description": "0 deactivated, 1 activated, "
                                            "2 suspended, 3 deleted"},
            "webhooks": {"type": "array", "items": {
                "$ref": "#/components/schemas/Webhook"}},
            "created_at": {"type": "string", "format": "date-time"},
            "updated_at": {"type": "string", "format": "date-time"},
        },
        "required": ["topic_full_name", "pulsar_url"],
    },
    "Webhook": {
        "type": "object",
        "properties": {
            "url": {"type": "string"},
            "headers": {"type": "array", "items": {"type": "string"}},
            "subscription": {"type": "string", "minLength": 5},
            "subscription_type": {"type": "string",
                                  "enum": ["exclusive", "shared", "keyshared",
                                           "failover"]},
            "initial_position": {"type": "string",
                                 "enum": ["latest", "earliest"]},
            "webhook_status": {"type": "integer"},
        },
        "required": ["url", "subscription"],
    },
    "TopicKey": {  # model.TopicKey (api.go topicGetParams/topicDeleteParams)
        "type": "object",
        "properties": {"topic_full_name": {"type": "string"},
                       "pulsar_url": {"type": "string"}},
        "required": ["topic_full_name"],
    },
    "errorResponse": {  # util.ResponseErr (api.go:214-224)
        "type": "object",
        "properties": {"error": {"type": "string"}},
    },
}

_AUTH_SECURITY = {"jwt": [{"bearerJwt": []}], "header": [{"bearerJwt": []}]}


def build_spec(app) -> dict:
    """OpenAPI 3.0 document for the app's BOUND routes only: documented
    operations get their api.go contract, others a generic stub."""
    paths: dict[str, dict] = {}
    for r in app.routes:
        op = dict(_DOCUMENTED.get(r.pattern, {}).get(
            r.method,
            {"operationId": r.name.replace(" ", "-") + "-" + r.method.lower(),
             "summary": r.name,
             "responses": {"200": {"description": "OK"}}},
        ))
        # path template vars become required path parameters
        path_params = [
            {"name": v, "in": "path", "required": True,
             "schema": {"type": "string"}}
            for v in re.findall(r"\{(\w+)\}", r.pattern)
        ]
        if path_params:
            op["parameters"] = path_params + list(op.get("parameters", []))
        if r.auth in _AUTH_SECURITY:
            op["security"] = _AUTH_SECURITY[r.auth]
        paths.setdefault(r.pattern, {})[r.method.lower()] = op
    return {
        "openapi": "3.0.3",
        "info": {
            "title": "pulsar-beam-spark gateway",
            "description": "HTTP produce/consume + topic-config CRUD surface "
                           "(reference src/docs/api.go contract)",
            "version": "2.0",
        },
        "paths": paths,
        "components": {
            "schemas": dict(_SCHEMAS),
            "securitySchemes": {
                "bearerJwt": {"type": "http", "scheme": "bearer",
                              "bearerFormat": "JWT"},
            },
        },
    }
