INSERT { ?n <urn:bad> <urn:o> . ?s <urn:ok> "y" }
WHERE { ?s <urn:name> ?n }
