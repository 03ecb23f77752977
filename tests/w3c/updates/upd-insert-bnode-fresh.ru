INSERT { _:x <urn:label> ?n . _:x <urn:of> ?s }
WHERE { ?s <urn:name> ?n }
