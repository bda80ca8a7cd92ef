"""OAuth 2.0 authorization-code consent flow — the CONFIG-TIME half of
OAuth that precedes every sync using the runtime half
(sources/http.py Oauth2Authenticator, which only refreshes).

Reference parity (file:line cites into /root/reference):

- airbyte-oauth/src/main/java/io/airbyte/oauth/BaseOAuth2Flow.java —
  the abstract flow: ``getSourceConsentUrl`` builds the provider's
  authorize URL from (client_id, redirect_url, scopes, state)
  (:88-100, formatConsentUrl per concrete flow, e.g.
  flows/GithubOAuthFlow.java:59-77), ``completeSourceOAuth`` extracts
  the ``code`` query param from the redirect (:268-274, missing code
  is an error), POSTs the token request
  ``{client_id, redirect_uri, client_secret, code}`` (:245-261) as
  form-urlencoded or JSON (TOKEN_REQUEST_CONTENT_TYPE :41-64), and
  extracts the flow output from the JSON response —
  ``refresh_token`` required by default (:284-292).
- airbyte-oauth/.../BaseOAuthFlow.java:111-170 formatOAuthOutput —
  the flow output nests under the connector's output path (default
  ``["credentials"]``, BaseOAuth2Flow.java:296-299) and every
  server-side oauth param (client_id/client_secret) is replaced by
  the ``******`` mask (MoreOAuthParameters.java:27) so credentials
  never travel back through the platform payload.

Spark-first note: this is pure config-time control plane — no
DataFrame work belongs here. Its output feeds Oauth2Authenticator /
the declarative manifest's oauth2 authenticator, whose token refresh
then rides inside executor tasks (sources/http.py).

Secrets: client_secret is never logged, never echoed in errors, and
masked (``******``) in the returned platform payload exactly like the
reference. Error text includes only the endpoint and exception TYPE.
"""

from __future__ import annotations

import json
import secrets
import string
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

SECRET_MASK = "******"  # MoreOAuthParameters.java:27

_STATE_ALPHABET = string.ascii_letters + string.digits


def generate_state(length: int = 7) -> str:
    """BaseOAuth2Flow.generateRandomState (:128-131): a short random
    alphanumeric CSRF state (crypto-strong here; the reference uses
    commons-lang RandomStringUtils)."""
    return "".join(secrets.choice(_STATE_ALPHABET) for _ in range(length))


@dataclass(frozen=True)
class OAuthFlowSpec:
    """One provider's flow shape — what a concrete reference flow
    class hardcodes (GithubOAuthFlow.java:27-46: authorize URL, token
    URL, scope list and its delimiter) plus the instance credentials
    the platform stores as oauth params."""

    consent_url: str
    access_token_url: str
    client_id: str
    client_secret: str  # secret — never logged, masked in outputs
    scopes: tuple[str, ...] = ()
    # GithubOAuthFlow joins with %20 (:46), others with space or comma
    scope_delimiter: str = " "
    # extra static consent params (e.g. response_type=code, access_type)
    extra_consent_params: dict = field(default_factory=dict)
    # TOKEN_REQUEST_CONTENT_TYPE: "urlencoded" | "json" (:41-64)
    token_request_content_type: str = "urlencoded"
    # fields the provider's token response must carry into the config;
    # refresh_token-required is the BaseOAuth2Flow default (:284-292)
    output_fields: tuple[str, ...] = ("refresh_token",)
    # getDefaultOAuthOutputPath (:296-299)
    output_path: tuple[str, ...] = ("credentials",)

    def __post_init__(self):
        if self.token_request_content_type not in ("urlencoded", "json"):
            raise ValueError(
                "token_request_content_type must be 'urlencoded' or 'json'"
            )


def get_consent_url(
    spec: OAuthFlowSpec, redirect_url: str, state: str | None = None
) -> str:
    """The URL the user visits to grant consent
    (formatConsentUrl — GithubOAuthFlow.java:59-77 shape:
    client_id + redirect_uri + scope + state). The client SECRET never
    appears in the consent URL."""
    params = {
        "client_id": spec.client_id,
        "redirect_uri": redirect_url,
        **spec.extra_consent_params,
    }
    if spec.scopes:
        params["scope"] = spec.scope_delimiter.join(spec.scopes)
    params["state"] = state if state is not None else generate_state()
    sep = "&" if urllib.parse.urlparse(spec.consent_url).query else "?"
    return spec.consent_url + sep + urllib.parse.urlencode(params)


def extract_code_parameter(query_params: dict) -> str:
    """BaseOAuth2Flow.extractCodeParameter (:268-274): the redirect's
    query params must carry ``code``."""
    if "code" not in query_params:
        raise ValueError("Undefined 'code' from consent redirected url.")
    return str(query_params["code"])


def _token_request(spec: OAuthFlowSpec, code: str, redirect_url: str):
    """POST body + headers per TOKEN_REQUEST_CONTENT_TYPE (:41-64) over
    getAccessTokenQueryParameters (:245-261)."""
    body = {
        "client_id": spec.client_id,
        "redirect_uri": redirect_url,
        "client_secret": spec.client_secret,
        "code": code,
    }
    if spec.token_request_content_type == "json":
        return json.dumps(body).encode(), "application/json"
    return urllib.parse.urlencode(body).encode(), "application/x-www-form-urlencoded"


def complete_oauth_flow(
    spec: OAuthFlowSpec, code: str, redirect_url: str, timeout: float = 30.0
) -> dict:
    """code -> the provider's token response, reduced to the flow's
    declared output fields (completeOAuthFlow :226-243 +
    extractOAuthOutput :284-292: a missing required field — by default
    refresh_token — is an error naming the endpoint, never the
    payload)."""
    data, content_type = _token_request(spec, code, redirect_url)
    req = urllib.request.Request(
        spec.access_token_url,
        data=data,
        headers={"Content-Type": content_type, "Accept": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
    except Exception as e:
        # never echo the request body (it carries the client secret)
        raise ValueError(
            f"OAuth token request to {spec.access_token_url} failed: "
            f"{type(e).__name__}"
        ) from None
    out = {}
    for f_ in spec.output_fields:
        if f_ not in payload:
            raise ValueError(
                f"Missing '{f_}' in query params from {spec.access_token_url}"
            )
        out[f_] = payload[f_]
    return out


def complete_oauth(
    spec: OAuthFlowSpec,
    query_params: dict,
    redirect_url: str,
    timeout: float = 30.0,
    expected_state: str | None = None,
) -> dict:
    """completeSourceOAuth (:140-157): extract the code from the
    redirect params, run the token handshake, and shape the platform
    payload — flow outputs nested under the output path with the
    server-side oauth params masked
    (BaseOAuthFlow.formatOAuthOutput:111-122).

    ``expected_state``: the state issued at get_consent_url time. When
    given, a redirect whose ``state`` is absent or mismatched is
    rejected (CSRF). When omitted the caller owns the check (the
    reference platform verifies state server-side)."""
    if expected_state is not None:
        got = query_params.get("state")
        if got is None or str(got) != expected_state:
            raise ValueError(
                "State mismatch on consent redirect (possible CSRF): "
                "redirect carries "
                + ("no state" if got is None else "a different state")
            )
    out = dict(
        complete_oauth_flow(
            spec, extract_code_parameter(query_params), redirect_url,
            timeout=timeout,
        )
    )
    # server params travel back MASKED — the platform merges the real
    # values from its own store, never from this payload
    out["client_id"] = SECRET_MASK
    out["client_secret"] = SECRET_MASK
    for node in reversed(spec.output_path):
        out = {node: out}
    return out


def flow_spec_from_manifest(auth_spec: dict, config: dict) -> OAuthFlowSpec:
    """Declarative arm: build the flow spec from a manifest's oauth2
    authenticator block extended with the consent-flow fields
    (``consent_url``, optional ``scope_delimiter`` /
    ``extra_consent_params`` / ``token_request_content_type``), with
    ``{{ config... }}`` interpolation for the credential fields — the
    low-code analogue of a concrete BaseOAuth2Flow subclass, feeding
    the same manifest whose runtime oauth2 authenticator then
    refreshes with the completed flow's refresh token."""
    from airbyte_integrations_spark.sources.declarative import interpolate

    if auth_spec.get("type") != "oauth2":
        raise ValueError("consent flow needs an oauth2 authenticator block")
    if "consent_url" not in auth_spec:
        raise ValueError("oauth2 block carries no consent_url")
    if "token_refresh_endpoint" not in auth_spec:
        raise ValueError("oauth2 block carries no token_refresh_endpoint")
    ns = {"config": config}
    return OAuthFlowSpec(
        consent_url=interpolate(auth_spec["consent_url"], **ns),
        access_token_url=interpolate(auth_spec["token_refresh_endpoint"], **ns),
        client_id=interpolate(auth_spec["client_id"], **ns),
        client_secret=interpolate(auth_spec["client_secret"], **ns),
        scopes=tuple(auth_spec.get("scopes") or ()),
        scope_delimiter=auth_spec.get("scope_delimiter", " "),
        extra_consent_params=dict(auth_spec.get("extra_consent_params") or {}),
        token_request_content_type=auth_spec.get(
            "token_request_content_type", "urlencoded"
        ),
    )


def authenticator_from_flow(
    spec: OAuthFlowSpec,
    flow_output: dict,
    token_refresh_endpoint: str | None = None,
):
    """Bridge to the RUNTIME half: the completed flow's refresh token +
    the spec's real credentials build the Oauth2Authenticator that
    sources/http.py attaches per request (OAuthImplementationFactory's
    handoff of flow output into connector config). Accepts either the
    flat flow output or the nested platform payload."""
    from airbyte_integrations_spark.sources.http import Oauth2Authenticator

    node = flow_output
    for key in spec.output_path:
        if isinstance(node, dict) and key in node:
            node = node[key]
    if "refresh_token" not in node:
        raise ValueError("flow output carries no refresh_token")
    return Oauth2Authenticator(
        token_refresh_endpoint=token_refresh_endpoint or spec.access_token_url,
        client_id=spec.client_id,
        client_secret=spec.client_secret,
        refresh_token=node["refresh_token"],
        scopes=list(spec.scopes) or None,
    )
