WITH <urn:tgt>
INSERT { ?s <urn:flag> "f" }
USING <urn:g1>
WHERE { ?s ?p ?o }
