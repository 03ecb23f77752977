DELETE { ?s <urn:age> ?x }
WHERE { ?s <urn:name> ?n OPTIONAL { ?s <urn:missing> ?x } }
